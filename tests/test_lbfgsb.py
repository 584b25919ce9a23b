"""End-to-end tests for the L-BFGS-B solver (lbfgsb.py).

Coverage mirrors the reference acceptance suite:

* the box-constrained Rosenbrock example (example-rosenbrock-box.cpp:36-64)
  with the exact same bounds / mixed-boundary starts, checked for
  convergence and against the trajectory oracle;
* the README box example (README.md:164-193): Rosenbrock n=10, lb=2, ub=4;
* random bound-constrained convex quadratics against scipy L-BFGS-B and the
  closed-form projected solution;
* infinite bounds reduce to (nearly) the unconstrained solver;
* pinned variables lb == ub;
* batch mode: vmap over many instances matches per-instance solves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbfgspp_tpu import LBFGSBParams, Status, minimize_b
from lbfgspp_tpu.utils.objectives import (rosenbrock_chained,
                                          rosenbrock_chained_fg,
                                          rosenbrock, rosenbrock_fg)
import oracle_b


def np_fg(fun_and_grad):
    def fg(x):
        fx, g = fun_and_grad(jnp.asarray(x))
        return float(fx), np.asarray(g)
    return fg


def box_example_setup():
    """example-rosenbrock-box.cpp:38-53 exactly."""
    n = 25
    lb = np.full(n, 2.0)
    ub = np.full(n, 4.0)
    lb[2], ub[2] = -np.inf, np.inf
    x0 = np.full(n, 3.0)
    x0[0] = x0[1] = 2.0
    x0[5] = x0[7] = 4.0
    return x0, lb, ub


def test_box_rosenbrock_example():
    x0, lb, ub = box_example_setup()
    res = minimize_b(fun_and_grad=rosenbrock_chained_fg,
                     x0=jnp.asarray(x0), lb=jnp.asarray(lb),
                     ub=jnp.asarray(ub))
    assert int(res.status) in (int(Status.CONVERGED_GRAD),
                               int(Status.CONVERGED_DELTA))
    # Oracle trajectory comparison: same iterate count and final point.
    xo, fo, go, pgo, ko = oracle_b.lbfgsb_minimize(
        np_fg(rosenbrock_chained_fg), x0, oracle_b.default_b_params(),
        lb, ub)
    assert int(res.niter) == ko
    np.testing.assert_allclose(np.asarray(res.x), xo, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(res.fx), fo, rtol=1e-10)


def test_readme_box_example():
    """README.md:164-193: Rosenbrock n=10 in [2, 4]^10."""
    n = 10
    lb = jnp.full((n,), 2.0)
    ub = jnp.full((n,), 4.0)
    x0 = jnp.full((n,), 3.0)
    p = LBFGSBParams(epsilon=1e-6, max_iterations=100)
    res = minimize_b(fun_and_grad=rosenbrock_fg, x0=x0, lb=lb, ub=ub,
                     params=p)
    assert int(res.status) in (int(Status.CONVERGED_GRAD),
                               int(Status.CONVERGED_DELTA))
    xo, fo, go, pgo, ko = oracle_b.lbfgsb_minimize(
        np_fg(rosenbrock_fg), np.asarray(x0),
        oracle_b.default_b_params(epsilon=1e-6, max_iterations=100),
        np.asarray(lb), np.asarray(ub))
    assert int(res.niter) == ko
    np.testing.assert_allclose(float(res.fx), fo, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), xo, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("seed", range(6))
def test_random_quadratic_vs_projection(seed):
    """Separable convex quadratic: the box minimum is the clipped
    unconstrained minimum."""
    rng = np.random.default_rng(seed)
    n = 12
    d = rng.standard_normal(n) * 3.0
    w = 0.5 + rng.random(n)
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)

    def fg(x):
        r = x - jnp.asarray(d)
        return jnp.sum(jnp.asarray(w) * r * r), 2.0 * jnp.asarray(w) * r

    x0 = rng.uniform(-1, 1, n)
    res = minimize_b(fun_and_grad=fg, x0=jnp.asarray(x0),
                     lb=jnp.asarray(lb), ub=jnp.asarray(ub),
                     params=LBFGSBParams(epsilon=1e-8, epsilon_rel=0.0))
    want = np.clip(d, lb, ub)
    # The default past/delta objective test can stop at |x - x*| ~ sqrt(delta)
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_random_trajectories_match_oracle(seed):
    """General random quadratic with coupling, random bounds: full
    trajectory parity with the index-set oracle."""
    rng = np.random.default_rng(100 + seed)
    n = 9
    a_half = rng.standard_normal((n, n)) / np.sqrt(n)
    a = a_half @ a_half.T + 0.5 * np.eye(n)
    b = rng.standard_normal(n)
    lb = rng.standard_normal(n) - 1.5
    ub = lb + 1.0 + rng.random(n)
    x0 = np.clip(rng.standard_normal(n), lb, ub)

    aj, bj = jnp.asarray(a), jnp.asarray(b)

    def fg(x):
        ax = aj @ x
        return 0.5 * x @ ax + bj @ x, ax + bj

    res = minimize_b(fun_and_grad=fg, x0=jnp.asarray(x0),
                     lb=jnp.asarray(lb), ub=jnp.asarray(ub))
    xo, fo, go, pgo, ko = oracle_b.lbfgsb_minimize(
        np_fg(fg), x0, oracle_b.default_b_params(), lb, ub)
    assert int(res.niter) == ko
    np.testing.assert_allclose(float(res.fx), fo, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), xo, rtol=1e-7, atol=1e-9)
    # scipy cross-check on the converged objective
    from scipy.optimize import minimize as sp_min
    out = sp_min(lambda x: (0.5 * x @ a @ x + b @ x, a @ x + b), x0,
                 jac=True, method="L-BFGS-B", bounds=list(zip(lb, ub)))
    assert float(res.fx) <= out.fun + 1e-6


def test_infinite_bounds_close_to_unconstrained():
    n = 10
    x0 = jnp.zeros((n,))
    lb = jnp.full((n,), -jnp.inf)
    ub = jnp.full((n,), jnp.inf)
    res = minimize_b(fun_and_grad=rosenbrock_fg, x0=x0, lb=lb, ub=ub,
                     params=LBFGSBParams(epsilon=1e-6, max_iterations=200))
    assert float(res.fx) < 1e-9
    np.testing.assert_allclose(np.asarray(res.x), np.ones(n), atol=1e-4)


def test_pinned_variables():
    """lb[i] == ub[i] pins a variable (Cauchy.h:113-114)."""
    n = 8
    lb = np.full(n, -5.0)
    ub = np.full(n, 5.0)
    lb[3] = ub[3] = 2.5
    lb[6] = ub[6] = -0.5
    d = np.arange(n, dtype=float)

    def fg(x):
        r = x - jnp.asarray(d)
        return jnp.sum(r * r), 2.0 * r

    res = minimize_b(fun_and_grad=fg, x0=jnp.zeros((n,)),
                     lb=jnp.asarray(lb), ub=jnp.asarray(ub),
                     params=LBFGSBParams(epsilon=1e-8, epsilon_rel=0.0))
    want = np.clip(d, lb, ub)
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-6)
    assert float(res.x[3]) == 2.5
    assert float(res.x[6]) == -0.5


def test_start_outside_box_is_projected():
    """LBFGSB.h:126-128: infeasible x0 is projected before solving."""
    n = 6
    d = np.full(n, 10.0)

    def fg(x):
        r = x - jnp.asarray(d)
        return jnp.sum(r * r), 2.0 * r

    res = minimize_b(fun_and_grad=fg, x0=jnp.full((n,), -100.0),
                     lb=jnp.zeros((n,)), ub=jnp.ones((n,)),
                     params=LBFGSBParams(epsilon=1e-8, epsilon_rel=0.0))
    np.testing.assert_allclose(np.asarray(res.x), np.ones(n), atol=1e-8)


def test_early_exit_at_minimizer():
    n = 5
    d = jnp.zeros((n,))

    def fg(x):
        r = x - d
        return jnp.sum(r * r), 2.0 * r

    res = minimize_b(fun_and_grad=fg, x0=jnp.zeros((n,)),
                     lb=jnp.full((n,), -1.0), ub=jnp.full((n,), 1.0))
    assert int(res.niter) == 1
    assert int(res.status) == int(Status.CONVERGED_GRAD)


def test_vmap_batch_matches_single():
    """A batch of independent box problems under vmap equals per-instance
    solves (instance isolation via the frozen-carry masking)."""
    n, batch = 6, 8
    rng = np.random.default_rng(42)
    d = rng.standard_normal((batch, n)) * 2.0
    x0 = rng.uniform(-1, 1, (batch, n))
    lb = jnp.full((n,), -1.0)
    ub = jnp.full((n,), 1.0)
    params = LBFGSBParams(epsilon=1e-8, epsilon_rel=0.0)

    def solve_one(di, x0i):
        def fg(x):
            r = x - di
            return jnp.sum(r * r), 2.0 * r
        return minimize_b(fun_and_grad=fg, x0=x0i, lb=lb, ub=ub,
                          params=params)

    batched = jax.vmap(solve_one)(jnp.asarray(d), jnp.asarray(x0))
    for i in range(batch):
        single = solve_one(jnp.asarray(d[i]), jnp.asarray(x0[i]))
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=1e-12)
        assert int(batched.niter[i]) == int(single.niter)
    np.testing.assert_allclose(np.asarray(batched.x),
                               np.clip(d, -1.0, 1.0), atol=1e-6)


def test_jit_compatible():
    n = 8
    lb = jnp.full((n,), 2.0)
    ub = jnp.full((n,), 4.0)

    @jax.jit
    def solve(x0):
        return minimize_b(fun_and_grad=rosenbrock_fg, x0=x0, lb=lb, ub=ub)

    res = solve(jnp.full((n,), 3.0))
    res2 = solve(jnp.full((n,), 2.5))
    assert int(res.status) in (1, 2)
    assert int(res2.status) in (1, 2)
