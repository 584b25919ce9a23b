"""Pytree-parameter front end (lbfgspp_tpu/pytree.py).

The flat solvers' contract is the reference's ``Eigen::VectorXd``
(LBFGS.h:79, LBFGSB.h:117); these tests pin that the pytree lift is exactly
the flat solve composed with ravel/unravel — same trajectory, structure and
dtypes preserved — and that it carries the JAX-native use cases the flat API
can't express directly (training structured model parameters, per-leaf
boxes, freezing a layer by pinning).
"""

import conftest  # noqa: F401  (forces CPU/x64/8 devices before jax init)

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from lbfgspp_tpu import (LBFGSParams, LBFGSBParams, Status,
                         minimize, minimize_b,
                         minimize_pytree, minimize_b_pytree)


def tree_quadratic(t):
    """Separable quadratic with distinct curvatures and optima per leaf."""
    return (jnp.sum(2.0 * (t["a"] - 1.5) ** 2)
            + jnp.sum(0.5 * (t["b"]["w"] + 2.0) ** 2)
            + jnp.sum(3.0 * (t["b"]["v"] - 0.25) ** 2))


def _x0_tree():
    return {"a": jnp.array([0.3, -0.7, 2.2]),
            "b": {"w": jnp.array([[1.0, -1.0], [0.5, 4.0]]),
                  "v": jnp.array([9.0])}}


def test_matches_flat_solve_exactly():
    """The pytree solve IS the flat solve of fun∘unravel — bit-identical."""
    x0 = _x0_tree()
    flat0, unravel = ravel_pytree(x0)
    p = LBFGSParams(epsilon=1e-10, epsilon_rel=0.0)

    res_t = minimize_pytree(tree_quadratic, x0, p)
    res_f = minimize(lambda z: tree_quadratic(unravel(z)), flat0, p)

    assert int(res_t.niter) == int(res_f.niter)
    assert float(res_t.fx) == float(res_f.fx)
    np.testing.assert_array_equal(np.asarray(ravel_pytree(res_t.x)[0]),
                                  np.asarray(res_f.x))
    np.testing.assert_array_equal(np.asarray(ravel_pytree(res_t.grad)[0]),
                                  np.asarray(res_f.grad))


def test_structure_dtype_and_solution():
    res = minimize_pytree(tree_quadratic, _x0_tree(),
                          LBFGSParams(epsilon=1e-10, epsilon_rel=0.0))
    assert jax.tree.structure(res.x) == jax.tree.structure(_x0_tree())
    assert res.x["b"]["w"].shape == (2, 2)
    assert int(res.status) == Status.CONVERGED_GRAD
    np.testing.assert_allclose(np.asarray(res.x["a"]), 1.5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x["b"]["w"]), -2.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x["b"]["v"]), 0.25, atol=1e-8)
    # Gradient tree is the unraveled final gradient.
    np.testing.assert_allclose(np.asarray(res.grad["a"]), 0.0, atol=1e-8)


def test_fun_and_grad_tree_contract():
    """Explicit (fx, grad_tree) oracle matches the autodiff path exactly."""
    x0 = _x0_tree()
    fg = jax.value_and_grad(tree_quadratic)
    res_o = minimize_pytree(None, x0, fun_and_grad=fg)
    res_a = minimize_pytree(tree_quadratic, x0)
    assert int(res_o.niter) == int(res_a.niter)
    np.testing.assert_array_equal(
        np.asarray(ravel_pytree(res_o.x)[0]),
        np.asarray(ravel_pytree(res_a.x)[0]))


def test_jit_and_vmap_compose():
    """A batch of parameter trees solves as one vmapped program."""
    batch = 8
    key = jax.random.PRNGKey(0)
    x0s = {"a": jax.random.normal(key, (batch, 3)),
           "b": {"w": jax.random.normal(jax.random.fold_in(key, 1),
                                        (batch, 2, 2)),
                 "v": jax.random.normal(jax.random.fold_in(key, 2),
                                        (batch, 1))}}
    solve = jax.jit(jax.vmap(
        lambda t: minimize_pytree(tree_quadratic, t,
                                  LBFGSParams(epsilon=1e-10, epsilon_rel=0.0))))
    res = solve(x0s)
    assert res.x["a"].shape == (batch, 3)
    np.testing.assert_allclose(np.asarray(res.x["a"]), 1.5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.x["b"]["v"]), 0.25, atol=1e-7)
    assert np.all(np.asarray(res.status) == Status.CONVERGED_GRAD)


def test_box_scalar_bounds_match_flat():
    """Scalar lb/ub broadcast to every parameter; matches the flat box."""
    x0 = _x0_tree()
    flat0, unravel = ravel_pytree(x0)
    p = LBFGSBParams(epsilon=1e-9, epsilon_rel=0.0)

    res_t = minimize_b_pytree(tree_quadratic, x0, 0.0, 2.0, p)
    lbf = jnp.zeros_like(flat0)
    ubf = jnp.full_like(flat0, 2.0)
    res_f = minimize_b(lambda z: tree_quadratic(unravel(z)),
                       flat0, lbf, ubf, p)
    assert int(res_t.niter) == int(res_f.niter)
    np.testing.assert_array_equal(np.asarray(ravel_pytree(res_t.x)[0]),
                                  np.asarray(res_f.x))
    # The w-block optimum (-2) is clipped to the lower bound 0.
    np.testing.assert_allclose(np.asarray(res_t.x["b"]["w"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_t.x["a"]), 1.5, atol=1e-7)


def test_box_per_leaf_bounds_and_pinning():
    """Per-leaf boxes: one leaf boxed, one unbounded, one pinned
    (lb == ub freezes a 'layer', Cauchy.h:113-114)."""
    x0 = _x0_tree()
    lb = {"a": 1.7, "b": {"w": -jnp.inf, "v": jnp.array([5.0])}}
    ub = {"a": 10.0, "b": {"w": jnp.inf, "v": jnp.array([5.0])}}
    res = minimize_b_pytree(tree_quadratic, x0, lb, ub,
                            LBFGSBParams(epsilon=1e-9, epsilon_rel=0.0))
    np.testing.assert_allclose(np.asarray(res.x["a"]), 1.7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x["b"]["w"]), -2.0, atol=1e-7)
    # Pinned leaf stays exactly at the pin.
    np.testing.assert_array_equal(np.asarray(res.x["b"]["v"]),
                                  np.asarray([5.0]))


def test_box_bad_bound_structure_raises():
    with pytest.raises(ValueError):
        minimize_b_pytree(tree_quadratic, _x0_tree(),
                          jnp.zeros((3,)), 1.0)


def test_mlp_training():
    """The canonical JAX use: fit a tiny MLP's parameter tree by L-BFGS."""
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jax.random.uniform(k1, (64, 1), minval=-2.0, maxval=2.0)
    ys = jnp.sin(2.0 * xs) + 0.5 * xs

    params0 = {
        "l1": {"w": 0.5 * jax.random.normal(k2, (1, 16)),
               "b": jnp.zeros((16,))},
        "l2": {"w": 0.5 * jax.random.normal(k3, (16, 1)),
               "b": jnp.zeros((1,))},
    }

    def forward(p, x):
        h = jnp.tanh(x @ p["l1"]["w"] + p["l1"]["b"])
        return h @ p["l2"]["w"] + p["l2"]["b"]

    def loss(p):
        return jnp.mean((forward(p, xs) - ys) ** 2)

    f0 = float(loss(params0))
    res = minimize_pytree(loss, params0,
                          LBFGSParams(epsilon=1e-8, max_iterations=400))
    assert float(res.fx) < 1e-3 * f0, (float(res.fx), f0)
    assert jax.tree.structure(res.x) == jax.tree.structure(params0)
    # The result tree drops straight back into the forward pass.
    pred = forward(res.x, xs)
    assert float(jnp.mean((pred - ys) ** 2)) == pytest.approx(
        float(res.fx), rel=1e-6)
