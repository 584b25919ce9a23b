"""Tests for the per-iteration tracing subsystem (utils/trace.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from lbfgspp_tpu import (LBFGSParams, LBFGSBParams, minimize, minimize_b,
                         solver, solver_b)
from lbfgspp_tpu.utils.objectives import rosenbrock, rosenbrock_chained_fg
from lbfgspp_tpu.utils.trace import run_traced


def test_traced_matches_plain():
    n = 10
    p = LBFGSParams(epsilon=1e-6, max_iterations=100)
    ref = minimize(rosenbrock, jnp.zeros(n), p)
    res, trace = run_traced(solver(rosenbrock, p), jnp.zeros(n), 100)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))

    valid = np.asarray(trace.valid)
    fx = np.asarray(trace.fx)[valid]
    gnorm = np.asarray(trace.gnorm)[valid]
    # The recorded iteration count equals the result's.
    assert valid.sum() == int(ref.niter)
    # Objective decreases monotonically on Rosenbrock from 0 with Wolfe LS.
    assert np.all(np.diff(fx) <= 1e-12)
    # Final entries match the result.
    assert fx[-1] == float(ref.fx)
    assert gnorm[-1] == float(ref.gnorm)


def test_traced_is_jittable_and_vmappable():
    n, batch = 8, 4
    p = LBFGSParams(epsilon=1e-6, max_iterations=50)
    s = solver(rosenbrock, p)

    @jax.jit
    @jax.vmap
    def solve(x0):
        res, trace = run_traced(s, x0, 50)
        return res.fx, trace.fx, trace.valid

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-1, 1, (batch, n)))
    fx, trace_fx, valid = solve(x0s)
    assert trace_fx.shape == (batch, 50)
    for i in range(batch):
        vi = np.asarray(valid[i])
        assert np.asarray(trace_fx[i])[vi][-1] == float(fx[i])


def test_traced_b_solver():
    n = 10
    lb = jnp.full((n,), 2.0)
    ub = jnp.full((n,), 4.0)
    p = LBFGSBParams(epsilon=1e-6, max_iterations=100)
    sb = solver_b(fun_and_grad=rosenbrock_chained_fg, lb=lb, ub=ub, params=p)
    ref = minimize_b(fun_and_grad=rosenbrock_chained_fg,
                     x0=jnp.full((n,), 3.0), lb=lb, ub=ub, params=p)
    res, trace = run_traced(sb, jnp.full((n,), 3.0), 100)
    assert int(res.niter) == int(ref.niter)
    valid = np.asarray(trace.valid)
    assert valid.sum() == int(ref.niter)
    # The recorded gnorm is the projected-gradient infinity norm.
    assert np.asarray(trace.gnorm)[valid][-1] == float(ref.gnorm)
