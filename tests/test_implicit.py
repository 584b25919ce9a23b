"""Implicit differentiation (lbfgspp_tpu.diff.implicit_minimize).

Ground truths are closed-form solution maps (quadratics, clipped
projections) and central finite differences on a ridge-regularized
logistic regression.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbfgspp_tpu import LBFGSParams, LBFGSBParams
from lbfgspp_tpu.diff import implicit_minimize

P = LBFGSParams(epsilon=1e-10, epsilon_rel=0.0, max_iterations=200)
PB = LBFGSBParams(epsilon=1e-10, epsilon_rel=0.0, max_iterations=200)


def test_identity_map_quadratic():
    # x*(theta) = theta  =>  d sum(x*) / d theta = ones
    def f(x, theta):
        return 0.5 * jnp.sum((x - theta) ** 2)

    theta = jnp.asarray(np.linspace(-1.0, 2.0, 6))
    g = jax.grad(lambda th: jnp.sum(
        implicit_minimize(f, jnp.zeros(6), th, P).x))(theta)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_nonseparable_quadratic_matches_closed_form():
    # f = 0.5 x'Ax - theta'x  =>  x* = A^{-1} theta,
    # grad_theta (c'x*) = A^{-1} c   (A symmetric)
    rng = np.random.default_rng(0)
    n = 8
    B = rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.T + n * np.eye(n))
    c = jnp.asarray(rng.standard_normal(n))

    def f(x, theta):
        return 0.5 * x @ (A @ x) - theta @ x

    theta = jnp.asarray(rng.standard_normal(n))
    g = jax.grad(lambda th: c @ implicit_minimize(
        f, jnp.zeros(n), th, P).x)(theta)
    want = np.linalg.solve(np.asarray(A), np.asarray(c))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-7)


def test_fx_envelope_theorem():
    # loss(theta) = f(x*(theta), theta); d loss/d theta = partial_theta f
    # at the optimum.  f = 0.5||x - theta||^2 + 0.25 ||theta||^2
    # => x* = theta, loss = 0.25||theta||^2, d loss = 0.5 theta.
    def f(x, theta):
        return 0.5 * jnp.sum((x - theta) ** 2) + 0.25 * jnp.sum(theta ** 2)

    theta = jnp.asarray([0.3, -1.2, 0.7])
    g = jax.grad(lambda th: implicit_minimize(
        f, jnp.zeros(3), th, P).fx)(theta)
    np.testing.assert_allclose(np.asarray(g), 0.5 * np.asarray(theta),
                               atol=1e-6)


def test_box_active_set_zeroing():
    # x* = clip(theta, lb, ub): interior coords pass gradient 1, active
    # coords pass 0 (strict complementarity).
    def f(x, theta):
        return 0.5 * jnp.sum((x - theta) ** 2)

    lb = jnp.full(5, -1.0)
    ub = jnp.full(5, 1.0)
    theta = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 3.0])   # ends clip
    res = implicit_minimize(f, jnp.zeros(5), theta, PB, lb=lb, ub=ub)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.clip(np.asarray(theta), -1.0, 1.0),
                               atol=1e-8)
    g = jax.grad(lambda th: jnp.sum(implicit_minimize(
        f, jnp.zeros(5), th, PB, lb=lb, ub=ub).x))(theta)
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0],
                               atol=1e-6)


def test_ridge_logreg_hyperparam_vs_finite_differences():
    # d/d(log lam) of a validation loss through the ridge-logreg argmin.
    rng = np.random.default_rng(1)
    n, d = 40, 6
    A = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.sign(jnp.asarray(rng.standard_normal(n)))
    Av = jnp.asarray(rng.standard_normal((n, d)))
    yv = jnp.sign(jnp.asarray(rng.standard_normal(n)))

    def f(w, loglam):
        z = y * (A @ w)
        return jnp.mean(jnp.log1p(jnp.exp(-z))) \
            + 0.5 * jnp.exp(loglam) * jnp.sum(w ** 2)

    def val_loss(loglam):
        w = implicit_minimize(f, jnp.zeros(d), loglam, P).x
        z = yv * (Av @ w)
        return jnp.mean(jnp.log1p(jnp.exp(-z)))

    loglam = jnp.asarray(-1.0)
    g = float(jax.grad(val_loss)(loglam))
    eps = 1e-5
    fd = (float(val_loss(loglam + eps)) - float(val_loss(loglam - eps))) \
        / (2 * eps)
    assert abs(g - fd) <= 1e-5 * max(1.0, abs(fd)), (g, fd)


def test_fun_and_grad_path():
    def fg(x, theta):
        return 0.5 * jnp.sum((x - theta) ** 2), x - theta

    theta = jnp.asarray([1.0, -2.0, 0.5])
    g = jax.grad(lambda th: jnp.sum(implicit_minimize(
        fun_and_grad=fg, x0=jnp.zeros(3), theta=th, params=P).x))(theta)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_vmap_over_theta():
    def f(x, theta):
        return 0.5 * jnp.sum((x - theta) ** 2)

    thetas = jnp.asarray(np.random.default_rng(2)
                         .standard_normal((4, 5)))

    def loss(th):
        return jnp.sum(implicit_minimize(f, jnp.zeros(5), th, P).x ** 2)

    g = jax.vmap(jax.grad(loss))(thetas)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.asarray(thetas),
                               atol=1e-6)


def test_no_precondition_matches():
    def f(x, theta):
        return 0.5 * jnp.sum((x - theta) ** 2) + 0.1 * jnp.sum(x ** 4)

    theta = jnp.asarray([0.4, -0.8, 1.3])

    def loss(th, pre):
        return jnp.sum(implicit_minimize(f, jnp.zeros(3), th, P,
                                         precondition=pre).x)

    g1 = jax.grad(lambda th: loss(th, True))(theta)
    g2 = jax.grad(lambda th: loss(th, False))(theta)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-7)


def test_validation_errors():
    def f(x, theta):
        return jnp.sum(x ** 2)

    with pytest.raises(ValueError, match="exactly one"):
        implicit_minimize(x0=jnp.zeros(2), theta=jnp.zeros(2))
    with pytest.raises(ValueError, match="both lb and ub"):
        implicit_minimize(f, jnp.zeros(2), jnp.zeros(2),
                          lb=jnp.zeros(2))


# ---------------------------------------------------------------------
# Sharded implicit differentiation (collective CG adjoint)
# ---------------------------------------------------------------------

def _mesh():
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:8]), ("feat",))


def test_sharded_implicit_matches_unsharded():
    from lbfgspp_tpu.diff import implicit_minimize_sharded
    from lbfgspp_tpu.parallel.sharded import sharding_for

    mesh = _mesh()
    n = 64
    k = n // 8

    def local_fun(x_l, th):
        i = jax.lax.axis_index("feat")
        th_l = jax.lax.dynamic_slice_in_dim(th, i * k, k)
        return jnp.sum(0.5 * (x_l - th_l) ** 2 + 0.1 * (x_l - th_l) ** 4)

    def f_glob(x, th):
        return jnp.sum(0.5 * (x - th) ** 2 + 0.1 * (x - th) ** 4)

    theta = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    x0 = jax.device_put(jnp.zeros(n), sharding_for(mesh))
    g_ref = jax.grad(lambda th: jnp.sum(implicit_minimize(
        f_glob, jnp.zeros(n), th, P).x ** 2))(theta)
    for pre in (True, False):
        g = jax.grad(lambda th, pre=pre: jnp.sum(implicit_minimize_sharded(
            local_fun, x0, th, P, mesh=mesh, precondition=pre).x ** 2))(theta)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-8, atol=1e-10)


def test_sharded_implicit_nonseparable_logreg_hyperparam():
    """local_fun_and_grad with a psum inside (feature-sharded logistic
    regression) + a ridge hyperparameter: the collective-CG adjoint must
    reproduce the unsharded implicit gradient."""
    from lbfgspp_tpu.diff import implicit_minimize_sharded
    from lbfgspp_tpu.parallel.sharded import sharding_for

    mesh = _mesh()
    n, rows = 32, 24
    k = n // 8
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((rows, n)))
    y = jnp.sign(jnp.asarray(rng.standard_normal(rows)))

    def local_fg(w_l, loglam):
        i = jax.lax.axis_index("feat")
        a_l = jax.lax.dynamic_slice_in_dim(A, i * k, k, axis=1)
        logits = jax.lax.psum(a_l @ w_l, "feat")
        z = -y * logits
        fx = jnp.sum(jnp.logaddexp(0.0, z)) \
            + 0.5 * jnp.exp(loglam) * jax.lax.psum(jnp.sum(w_l ** 2),
                                                   "feat")
        dlogit = -y * jax.nn.sigmoid(z)
        g_l = a_l.T @ dlogit + jnp.exp(loglam) * w_l
        return fx, g_l

    def f_glob(w, loglam):
        z = -y * (A @ w)
        return jnp.sum(jnp.logaddexp(0.0, z)) \
            + 0.5 * jnp.exp(loglam) * jnp.sum(w ** 2)

    x0 = jax.device_put(jnp.zeros(n), sharding_for(mesh))
    ll = jnp.asarray(-0.7)
    g_ref = jax.grad(lambda t: jnp.sum(implicit_minimize(
        f_glob, jnp.zeros(n), t, P).x ** 2))(ll)
    g = jax.grad(lambda t: jnp.sum(implicit_minimize_sharded(
        local_fun_and_grad=local_fg, x0=x0, theta=t, params=P,
        mesh=mesh).x ** 2))(ll)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-7)


def test_sharded_implicit_box_active_set():
    from lbfgspp_tpu.diff import implicit_minimize_sharded
    from lbfgspp_tpu.parallel.sharded import sharding_for

    mesh = _mesh()
    n = 16
    k = n // 8

    def local_fun(x_l, th):
        i = jax.lax.axis_index("feat")
        th_l = jax.lax.dynamic_slice_in_dim(th, i * k, k)
        return jnp.sum(0.5 * (x_l - th_l) ** 2)

    theta = np.linspace(-2.0, 2.0, n)     # ends clip at the box
    lb = jnp.full(n, -1.0)
    ub = jnp.full(n, 1.0)
    x0 = jax.device_put(jnp.zeros(n), sharding_for(mesh))
    res = implicit_minimize_sharded(local_fun, x0, jnp.asarray(theta), PB,
                                    lb=lb, ub=ub, mesh=mesh)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.clip(theta, -1.0, 1.0), atol=1e-8)
    g = jax.grad(lambda th: jnp.sum(implicit_minimize_sharded(
        local_fun, x0, th, PB, lb=lb, ub=ub, mesh=mesh).x))(
        jnp.asarray(theta))
    want = ((theta > -1.0) & (theta < 1.0)).astype(np.float64)
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_integer_leaves_in_theta():
    """theta pytrees with non-float leaves (int labels, bool masks) must
    differentiate: jax.vjp returns float0 cotangents for them and the
    cotangent sum must pass those through (regression: 'Called add with a
    float0 array')."""
    y = jnp.asarray(np.array([1, -1, 1, 1], np.int32))

    def f(x, theta):
        lam = theta["lam"]
        sign = theta["y"].astype(x.dtype)
        return jnp.sum((x - sign) ** 2) + lam * jnp.sum(x ** 2)

    theta = {"lam": jnp.asarray(0.5), "y": y}
    params = LBFGSParams(epsilon=1e-10, max_iterations=100)

    def loss(lam):
        th = {"lam": lam, "y": y}
        res = implicit_minimize(f, jnp.zeros(4), th, params)
        return jnp.sum(res.x ** 2)

    g = jax.grad(loss)(jnp.asarray(0.5))
    # x* = sign/(1+lam) -> loss = 4/(1+lam)^2, dloss/dlam = -8/(1+lam)^3
    np.testing.assert_allclose(float(g), -8.0 / 1.5 ** 3, rtol=1e-6)


def test_integer_leaves_in_theta_sharded():
    from lbfgspp_tpu import implicit_minimize_sharded
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("feat",))
    n = 8
    y = jnp.asarray(np.resize([1, -1], n), np.int32)

    def local_f(x_l, theta):
        i = jax.lax.axis_index("feat")
        k = n // 4
        sign_l = jax.lax.dynamic_slice_in_dim(
            theta["y"].astype(x_l.dtype), i * k, k)
        part = jnp.sum((x_l - sign_l) ** 2) + \
            theta["lam"] * jnp.sum(x_l ** 2)
        return part

    params = LBFGSParams(epsilon=1e-10, max_iterations=100)

    def loss(lam):
        th = {"lam": lam, "y": y}
        res = implicit_minimize_sharded(local_f, jnp.zeros(n), th, params,
                                        mesh=mesh)
        return jnp.sum(res.x ** 2)

    g = jax.grad(loss)(jnp.asarray(0.5))
    np.testing.assert_allclose(float(g), -2.0 * n / 1.5 ** 3, rtol=1e-6)
