"""Property fuzzing: single line-search calls vs the NumPy oracle.

Each case builds a random smooth objective (quadratic + quartic, identical
op order in NumPy and JAX), a random point and a random *descent*
direction, then compares one full line-search call — accepted step, fx,
dg, x, and the exact evaluation count — across all four searches.  This
directly exercises the branch logic (interval cases, step selection,
safeguards) far off the solver's beaten path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lbfgspp_tpu.linesearch import LINE_SEARCHES
from lbfgspp_tpu.params import LBFGSParams
import oracle

SEARCH_NAMES = ["backtracking", "bracketing", "nocedalwright",
                "morethuente"]


def make_objective(n, rng):
    a = rng.standard_normal(n)
    b_half = rng.standard_normal((n, n)) / np.sqrt(n)
    b = b_half @ b_half.T + 0.1 * np.eye(n)
    c = rng.random(n) * 0.5

    def np_fg(x):
        bx = b @ x
        fx = float(a @ x + 0.5 * (x @ bx) + np.sum(c * x ** 4))
        g = a + bx + 4.0 * c * x ** 3
        return fx, g

    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    def j_fg(x):
        bx = bj @ x
        fx = aj @ x + 0.5 * (x @ bx) + jnp.sum(cj * x ** 4)
        g = aj + bx + 4.0 * cj * x ** 3
        return fx, g

    return np_fg, j_fg


@pytest.mark.parametrize("name", SEARCH_NAMES)
@pytest.mark.parametrize("seed", range(10))
def test_single_call_matches_oracle(name, seed):
    rng = np.random.default_rng(1000 * SEARCH_NAMES.index(name) + seed)
    n = 7
    np_fg, j_fg = make_objective(n, rng)

    xp = rng.standard_normal(n)
    fx0, g0 = np_fg(xp)
    # Random descent direction: negative gradient plus noise, re-projected
    drt = -g0 + 0.3 * rng.standard_normal(n)
    if drt @ g0 >= 0:
        drt = -g0
    dg0 = float(g0 @ drt)
    step0 = float(rng.uniform(0.05, 2.0))
    step_max = float(rng.uniform(2.0, 1e3))

    params = LBFGSParams(epsilon=1e-6, max_linesearch=40)
    pdict = oracle.default_params(epsilon=1e-6, max_linesearch=40)

    jax_search = LINE_SEARCHES[name]
    res = jax_search(j_fg, params, jnp.asarray(xp), jnp.asarray(drt),
                     step_max, step0, jnp.asarray(fx0), jnp.asarray(g0),
                     jnp.asarray(dg0))

    np_search = oracle.LINE_SEARCHES[name]
    try:
        o_step, o_fx, o_grad, o_dg, o_x, o_nfev = np_search(
            np_fg, pdict, xp, drt, step_max, step0, fx0, g0.copy(), dg0)
    except RuntimeError:
        # Oracle raised where the JAX search reports a failure status.
        assert int(res.status) != 0, (name, seed)
        return

    assert int(res.status) == 0, (name, seed)
    assert int(res.nfev) == o_nfev, (name, seed)
    np.testing.assert_allclose(float(res.step), o_step, rtol=1e-12,
                               atol=1e-15)
    np.testing.assert_allclose(float(res.fx), o_fx, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), o_x, rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(float(res.dg), o_dg, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", ["morethuente"])
@pytest.mark.parametrize("seed", range(6))
def test_capped_step_max_matches_oracle(name, seed):
    """Small step_max exercises the boundary exits (the L-BFGS-B regime)."""
    rng = np.random.default_rng(5000 + seed)
    n = 5
    np_fg, j_fg = make_objective(n, rng)
    xp = rng.standard_normal(n)
    fx0, g0 = np_fg(xp)
    drt = -g0
    dg0 = float(g0 @ drt)
    step_max = float(rng.uniform(1e-3, 0.5))
    step0 = min(1.0, step_max)

    params = LBFGSParams(epsilon=1e-6, max_linesearch=40)
    pdict = oracle.default_params(epsilon=1e-6, max_linesearch=40)

    res = LINE_SEARCHES[name](j_fg, params, jnp.asarray(xp),
                              jnp.asarray(drt), step_max, step0,
                              jnp.asarray(fx0), jnp.asarray(g0),
                              jnp.asarray(dg0))
    o_step, o_fx, o_grad, o_dg, o_x, o_nfev = oracle.LINE_SEARCHES[name](
        np_fg, pdict, xp, drt, step_max, step0, fx0, g0.copy(), dg0)
    assert int(res.nfev) == o_nfev, seed
    np.testing.assert_allclose(float(res.step), o_step, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), o_x, rtol=1e-12,
                               atol=1e-14)
