"""Line-search unit tests: each JAX search against the NumPy oracle on many
random 1-D slices, plus the reference's documented failure modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbfgspp_tpu.linesearch import LINE_SEARCHES
from lbfgspp_tpu.params import LBFGSParams
from lbfgspp_tpu.types import Status
from lbfgspp_tpu.utils import objectives


def np_rosen_fg(x):
    fx, g = objectives.rosenbrock_fg(jnp.asarray(x))
    return float(fx), np.asarray(g)


def random_case(seed, n=8):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    xp = jax.random.uniform(k1, (n,), jnp.float64, -1.5, 1.5)
    fx, grad = objectives.rosenbrock_fg(xp)
    # Random descent-ish direction: mix of -grad and noise
    noise = jax.random.normal(k2, (n,), jnp.float64)
    drt = -grad + 0.3 * jnp.linalg.norm(grad) * noise / jnp.linalg.norm(noise)
    dg = jnp.dot(grad, drt)
    if float(dg) >= 0:
        drt = -grad
        dg = jnp.dot(grad, drt)
    return xp, drt, fx, grad, dg


# "speculative" is a TPU-native batched-throughput search with no
# reference counterpart (hence no oracle); see test_speculative.py.
ORACLE_SEARCHES = sorted(set(LINE_SEARCHES) & set(oracle.LINE_SEARCHES))


@pytest.mark.parametrize("name", ORACLE_SEARCHES)
@pytest.mark.parametrize("seed", range(12))
def test_matches_oracle(name, seed):
    params = LBFGSParams(max_linesearch=40)
    op = oracle.default_params(max_linesearch=40)
    xp, drt, fx, grad, dg = random_case(seed)
    step0 = 1.0

    search = LINE_SEARCHES[name]
    res = search(objectives.rosenbrock_fg, params, xp, drt,
                 params.max_step, step0, fx, grad, dg)

    try:
        ostep, ofx, ograd, odg, ox, onfev = oracle.LINE_SEARCHES[name](
            np_rosen_fg, op, np.asarray(xp), np.asarray(drt),
            op["max_step"], step0, float(fx), np.asarray(grad), float(dg))
    except RuntimeError:
        assert int(res.status) != Status.RUNNING
        return

    assert int(res.status) == Status.RUNNING  # 0 == success for a search
    assert int(res.nfev) == onfev, (name, seed)
    np.testing.assert_allclose(float(res.step), ostep, rtol=1e-12)
    np.testing.assert_allclose(float(res.fx), ofx, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), ox, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(float(res.dg), odg, rtol=1e-10, atol=1e-13)


@pytest.mark.parametrize("name", sorted(LINE_SEARCHES))
def test_invalid_step_rejected(name):
    """Reference: 'step' must be positive (throws invalid_argument)."""
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(0)
    res = LINE_SEARCHES[name](objectives.rosenbrock_fg, params, xp, drt,
                              params.max_step, 0.0, fx, grad, dg)
    assert int(res.status) == Status.LS_INVALID_STEP


@pytest.mark.parametrize("name", ["morethuente", "nocedalwright"])
def test_ascent_direction_rejected(name):
    """Reference throws logic_error on non-descent directions."""
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(1)
    res = LINE_SEARCHES[name](objectives.rosenbrock_fg, params, xp, grad,
                              params.max_step, 1.0, fx, grad,
                              jnp.dot(grad, grad))
    assert int(res.status) == Status.LS_NOT_DESCENT


def test_morethuente_honors_step_max():
    """The Moré-Thuente search must respect step_max (L-BFGS-B contract,
    LBFGSB.h:200-203)."""
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(2)
    step_max = 0.01
    res = LINE_SEARCHES["morethuente"](
        objectives.rosenbrock_fg, params, xp, drt, step_max,
        min(1.0, step_max), fx, grad, dg)
    assert float(res.step) <= step_max + 1e-15


def test_morethuente_exhaustion_returns_best_so_far():
    """LineSearchMoreThuente.h:602-614: when trials run out, return the _lo
    state instead of failing."""
    params = LBFGSParams(max_linesearch=2, wolfe=0.1000001, ftol=0.1)
    xp, drt, fx, grad, dg = random_case(3)
    res = LINE_SEARCHES["morethuente"](
        objectives.rosenbrock_fg, params, xp, drt, params.max_step, 1.0,
        fx, grad, dg)
    # Whatever happened, the returned point must never be worse than start
    assert int(res.status) == Status.RUNNING
    assert float(res.fx) <= float(fx)
