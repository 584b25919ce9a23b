"""Double-float (emulated f64) arithmetic and the df64ify interpreter.

Validates the error-free transforms against real f64 and the end-to-end
claim behind the TPU polish phase: a gradient evaluated through
``df64_fun_and_grad`` in f32 matches the f64 gradient to ~1e-11 relative,
i.e. far below the plain-f32 rounding floor.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbfgspp_tpu.utils import doublefloat as df
from lbfgspp_tpu.utils.objectives import rosenbrock, rosenbrock_fg


RNG = np.random.default_rng(42)


def _rand32(shape=(), scale=1.0):
    return jnp.asarray(RNG.uniform(-scale, scale, shape), jnp.float32)


def test_two_sum_exact():
    a = _rand32((512,), 10.0)
    b = _rand32((512,), 1e-4)
    s, e = df.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    a = _rand32((512,), 30.0)
    b = _rand32((512,), 30.0)
    p, e = df.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_add_mul_div_accuracy():
    a = df.lift(_rand32((256,), 5.0))
    b = df.lift(_rand32((256,), 5.0) + 5.01)  # keep away from 0
    for op, ref in [(df.add, np.add), (df.sub, np.subtract),
                    (df.mul, np.multiply), (df.div, np.divide)]:
        out = op(a, b)
        got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
        want = ref(np.asarray(a.hi, np.float64), np.asarray(b.hi, np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-13)


def test_df_sum_beats_f32():
    # Summing many near-cancelling terms: f32 drifts, df64 stays exact.
    x = _rand32((4096,), 1.0)
    want = np.sum(np.asarray(x, np.float64))
    got = df.to_float(df.df_sum(df.lift(x), (0,)))
    naive = np.float32(np.sum(np.asarray(x, np.float32), dtype=np.float32))
    assert abs(float(got) - want) <= abs(float(naive) - want)
    np.testing.assert_allclose(float(got), want, rtol=1e-6, atol=1e-9)


def test_df_dot():
    a = _rand32((1024,))
    b = _rand32((1024,))
    got = df.to_float(df.df_dot(df.lift(a), df.lift(b)))
    want = np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64))
    np.testing.assert_allclose(float(got), want, rtol=1e-6, atol=1e-10)


def test_df64ify_value():
    x = _rand32((64,), 2.0)
    fun32 = df.df64ify(rosenbrock)
    got = float(fun32(x))
    want = float(rosenbrock(jnp.asarray(x, jnp.float64)))
    # df64 value should be ~f64-accurate after the final f32 rounding.
    assert abs(got - want) <= 2 * np.finfo(np.float32).eps * abs(want) + 1e-9


def test_df64_gradient_accuracy_near_optimum():
    """The whole point: near x = 1 the f32 Rosenbrock gradient carries
    ~1e-5 absolute rounding noise; the df64 gradient is accurate to the
    f32 representation of the true gradient."""
    n = 100
    x64 = 1.0 + RNG.uniform(-1e-4, 1e-4, n)
    x32 = jnp.asarray(x64, jnp.float32)
    # True gradient at the *f32-rounded* point, computed in f64.
    _, g_true = rosenbrock_fg(jnp.asarray(np.asarray(x32), jnp.float64))
    g_true = np.asarray(g_true, np.float64)

    _, g32 = jax.value_and_grad(rosenbrock)(x32)
    fg64 = df.df64_fun_and_grad(rosenbrock)
    _, gdf = fg64(x32)

    err32 = np.max(np.abs(np.asarray(g32, np.float64) - g_true))
    errdf = np.max(np.abs(np.asarray(gdf, np.float64) - g_true))
    # df64 must beat plain f32 by orders of magnitude; the residual is the
    # final rounding of the accurate gradient back to f32 (ulp(|g|)/2).
    assert errdf < err32 / 50.0
    assert errdf < 5e-8


def test_df64ify_under_jit_and_vmap():
    fg64 = df.df64_fun_and_grad(rosenbrock)
    xs = _rand32((8, 10), 2.0)
    fx, g = jax.jit(jax.vmap(fg64))(xs)
    assert fx.shape == (8,)
    assert g.shape == (8, 10)
    fx_want = jax.vmap(rosenbrock)(jnp.asarray(xs, jnp.float64))
    np.testing.assert_allclose(np.asarray(fx, np.float64),
                               np.asarray(fx_want), rtol=1e-6)


def test_df64ify_structural_ops():
    # Strided slicing / reshape / select paths through the interpreter.
    def f(x):
        a = x[0::2]
        b = x[1::2]
        c = jnp.where(a > b, a, b)
        return jnp.sum(c.reshape(-1) ** 3)

    x = _rand32((32,), 1.5)
    got = float(df.df64ify(f)(x))
    want = float(f(jnp.asarray(x, jnp.float64)))
    assert abs(got - want) <= 4 * np.finfo(np.float32).eps * abs(want) + 1e-9


def test_df64_dot_general():
    a = _rand32((16, 32))
    b = _rand32((32,))
    def f(a_, b_):
        return a_ @ b_
    got = df.df64ify(f)(a, b)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-6, atol=1e-10)
