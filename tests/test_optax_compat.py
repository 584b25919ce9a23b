"""optax interop (lbfgspp_tpu/optax_compat.py).

Pins that the optax-protocol wrapper drives the SAME solver: a standard
optax training loop reproduces `lt.minimize`'s trajectory iterate-for-
iterate, composes with ``optax.value_and_grad_from_state`` (no redundant
objective evaluations), handles pytree parameters, and goes quiescent
(zero updates) after termination.
"""

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.flatten_util import ravel_pytree

from lbfgspp_tpu import LBFGSParams, Status, minimize, solver
from lbfgspp_tpu import optax_compat


def rosen(x):
    xe, xo = x[0::2], x[1::2]
    return jnp.sum((1 - xe) ** 2 + (10 * (xo - xe * xe)) ** 2)


def _run_loop(loss, params0, opt, steps):
    state = opt.init(params0)
    params = params0
    traj = []
    for _ in range(steps):
        value, grad = jax.value_and_grad(loss)(params)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=loss)
        params = optax.apply_updates(params, updates)
        traj.append(params)
    return params, state, traj


def test_matches_solver_trajectory():
    """K optax updates == K Solver.step calls — bit-identical iterates."""
    p = LBFGSParams(epsilon=1e-10, epsilon_rel=0.0)
    x0 = jnp.zeros(10)
    steps = 8

    opt = optax_compat.lbfgs(p)
    _, _, traj = _run_loop(rosen, x0, opt, steps)

    s = solver(rosen, p)
    st = s.init(x0)
    for k in range(steps):
        st = s.step(st)
        np.testing.assert_array_equal(np.asarray(traj[k]), np.asarray(st.x))


def test_converges_and_goes_quiescent():
    p = LBFGSParams(epsilon=1e-6, max_iterations=100)
    x0 = jnp.zeros(10)
    opt = optax_compat.lbfgs(p)
    params, state, _ = _run_loop(rosen, x0, opt, 40)

    ref = minimize(rosen, x0, p)
    assert int(optax_compat.status(state)) == Status.CONVERGED_GRAD
    assert int(optax_compat.niter(state)) == int(ref.niter) == 22
    np.testing.assert_array_equal(np.asarray(params), np.asarray(ref.x))

    # Post-termination updates are exactly zero.
    value, grad = jax.value_and_grad(rosen)(params)
    updates, _ = opt.update(grad, state, params, value=value, grad=grad,
                            value_fn=rosen)
    assert float(jnp.max(jnp.abs(updates))) == 0.0


def test_value_and_grad_from_state_composes():
    """The canonical optax idiom: reuse the line search's last evaluation."""
    p = LBFGSParams(epsilon=1e-8)
    x0 = jnp.zeros(6)
    opt = optax_compat.lbfgs(p)
    vg = optax.value_and_grad_from_state(rosen)

    params, state = x0, opt.init(x0)

    @jax.jit
    def step(params, state):
        value, grad = vg(params, state=state)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=rosen)
        return optax.apply_updates(params, updates), state

    for _ in range(40):
        params, state = step(params, state)
    assert float(rosen(params)) < 1e-12
    np.testing.assert_allclose(np.asarray(params), 1.0, atol=1e-6)
    # The reused (value, grad) are the ones at the solver's iterate.  The
    # loop's params differ from it by ulps — `apply_updates` computes
    # x + (x' - x), which is not bit-equal to x' — so compare loosely.
    np.testing.assert_allclose(float(state.value), float(rosen(params)),
                               rtol=1e-6, atol=1e-18)


def test_pytree_params_and_jit():
    def loss(t):
        return (jnp.sum((t["a"] - 1.5) ** 2)
                + jnp.sum(0.5 * (t["w"] + 2.0) ** 2))

    t0 = {"a": jnp.zeros(3), "w": jnp.ones((2, 2))}
    opt = optax_compat.lbfgs(LBFGSParams(epsilon=1e-10, epsilon_rel=0.0))
    state = opt.init(t0)
    params = t0

    @jax.jit
    def step(params, state):
        value, grad = jax.value_and_grad(loss)(params)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=loss)
        return optax.apply_updates(params, updates), state

    for _ in range(20):
        params, state = step(params, state)
    np.testing.assert_allclose(np.asarray(params["a"]), 1.5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(params["w"]), -2.0, atol=1e-9)
    assert jax.tree.structure(state.grad) == jax.tree.structure(t0)


def test_requires_params():
    opt = optax_compat.lbfgs()
    state = opt.init(jnp.zeros(4))
    g = jnp.ones(4)
    with pytest.raises(ValueError):
        opt.update(g, state, value=1.0, value_fn=rosen)
