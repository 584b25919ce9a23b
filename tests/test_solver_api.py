"""Tests for the init/step/finalize solver API (checkpoint / resume).

The reference runs ``minimize`` to completion with internal mutable state
(LBFGS.h:31-38); the TPU design exposes the state as an explicit pytree so a
long solve can be driven step-by-step, serialized at any point, and resumed
bit-exactly (SURVEY.md §5 checkpoint/resume).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lbfgspp_tpu import (LBFGSParams, LBFGSBParams, minimize, minimize_b,
                         solver, solver_b)
from lbfgspp_tpu.utils.objectives import rosenbrock, rosenbrock_chained_fg


def state_to_numpy(state):
    """Serialize a solver state pytree to a flat numpy dict."""
    leaves, treedef = jax.tree.flatten(state)
    return [np.asarray(leaf) for leaf in leaves], treedef


def state_from_numpy(leaves, treedef):
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in leaves])


def test_stepwise_equals_run():
    n = 10
    p = LBFGSParams(epsilon=1e-6, max_iterations=100)
    s = solver(rosenbrock, p)
    ref = minimize(rosenbrock, jnp.zeros(n), p)

    state = s.init(jnp.zeros(n))
    for _ in range(int(ref.niter) + 5):   # extra steps are no-ops once done
        state = s.step(state)
    res = s.finalize(state)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    assert float(res.fx) == float(ref.fx)


def test_checkpoint_resume_bit_exact():
    """Serialize mid-solve, restore, continue: identical trajectory."""
    n = 10
    p = LBFGSParams(epsilon=1e-6, max_iterations=100)
    s = solver(rosenbrock, p)
    ref = minimize(rosenbrock, jnp.zeros(n), p)

    state = s.init(jnp.zeros(n))
    for _ in range(7):
        state = s.step(state)

    # Round-trip through host numpy (what an orbax/npz checkpoint stores).
    leaves, treedef = state_to_numpy(state)
    state2 = state_from_numpy(leaves, treedef)

    run_jit = jax.jit(s.run)
    out = s.finalize(run_jit(state2))
    assert int(out.niter) == int(ref.niter)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(ref.x))


def test_stepwise_b_equals_run():
    n = 10
    lb = jnp.full((n,), 2.0)
    ub = jnp.full((n,), 4.0)
    p = LBFGSBParams(epsilon=1e-6, max_iterations=100)
    sb = solver_b(fun_and_grad=rosenbrock_chained_fg, lb=lb, ub=ub, params=p)
    ref = minimize_b(fun_and_grad=rosenbrock_chained_fg,
                     x0=jnp.full((n,), 3.0), lb=lb, ub=ub, params=p)

    state = sb.init(jnp.full((n,), 3.0))
    for _ in range(int(ref.niter) + 3):
        state = sb.step(state)
    res = sb.finalize(state)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


def test_checkpoint_resume_b():
    n = 10
    lb = jnp.full((n,), 2.0)
    ub = jnp.full((n,), 4.0)
    p = LBFGSBParams(epsilon=1e-6, max_iterations=100)
    sb = solver_b(fun_and_grad=rosenbrock_chained_fg, lb=lb, ub=ub, params=p)
    ref = minimize_b(fun_and_grad=rosenbrock_chained_fg,
                     x0=jnp.full((n,), 3.0), lb=lb, ub=ub, params=p)

    state = sb.init(jnp.full((n,), 3.0))
    for _ in range(3):
        state = sb.step(state)
    leaves, treedef = state_to_numpy(state)
    state2 = state_from_numpy(leaves, treedef)
    out = sb.finalize(sb.run(state2))
    assert int(out.niter) == int(ref.niter)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(ref.x))
