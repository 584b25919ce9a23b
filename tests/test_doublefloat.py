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


def test_df64_transcendental_rules_pair_accuracy():
    """Round-5: exp/log/log1p/expm1/logistic/tanh/pow have pair-accurate
    df rules — without them these primitives fell back to hi-word
    (base-precision) evaluation and any exp/log objective silently lost
    the polish's sub-ulp resolution (the logreg/lasso production
    families).  Error metric is scale-floored (|err| / max(|f|, 1)): the
    quantity that bounds each term's contribution to an objective sum."""
    import jax.nn

    c01 = np.float64(np.float32(0.01))
    c17 = np.float64(np.float32(1.7))
    c05 = np.float64(np.float32(0.5))
    x32 = jnp.asarray(np.linspace(-10, 10, 81), jnp.float32)
    cases = [
        (lambda v: jnp.exp(v), np.exp),
        (lambda v: jnp.log(jnp.abs(v) + 0.5),
         lambda v: np.log(np.abs(v) + c05)),
        (lambda v: jnp.log1p(v * 0.01), lambda v: np.log1p(v * c01)),
        (lambda v: jnp.expm1(v * 0.01), lambda v: np.expm1(v * c01)),
        (jax.nn.sigmoid, lambda v: 1 / (1 + np.exp(-v))),
        (jnp.tanh, np.tanh),
        (lambda v: jnp.logaddexp(0.0, v), lambda v: np.logaddexp(0.0, v)),
        (lambda v: (jnp.abs(v) + 0.5) ** 1.7,
         lambda v: (np.abs(v) + c05) ** c17),
    ]
    for fn, ref in cases:
        out = df.df64ify(fn, to_native=False)(x32)
        got = (np.asarray(out.hi, np.float64) +
               np.asarray(out.lo, np.float64))
        want = ref(np.asarray(x32, np.float64))
        err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
        assert err < 5e-12, (fn, err)


def test_df64_exp_log_f64_pair_identity():
    """f64 pairs: log(exp(x)) round-trips to far beyond f64 precision
    (the rules target ~2^-105; an f64-only implementation would sit at
    ~1e-16)."""
    x = jnp.asarray(np.linspace(0.1, 30, 31), jnp.float64)
    d = df.sub(df.log(df.exp(df.lift(x))), df.lift(x))
    diff = np.abs(np.asarray(d.hi)) + np.abs(np.asarray(d.lo))
    assert np.max(diff / np.asarray(x)) < 1e-25


def test_df64_exp2_of_integer_is_exact():
    """jnp.exp2 on this backend returns 2^13 = 8192.004 in f32 (a
    polynomial approximation); the df exp's power-of-two scaling must be
    exact (ldexp) or every pair result carries a 5e-7 relative error."""
    k = jnp.asarray(np.arange(-30, 31), jnp.float32)
    out = df.exp(df.mul(df.lift(k), df._ln2_pair(jnp.float32)))
    got = (np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64))
    want = np.exp2(np.arange(-30, 31).astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=3e-14)


def test_eft_exact_under_jit():
    """Round-5 regression: under whole-graph jit, XLA's algebraic
    simplifier constant-reassociated ``(x + 1) - 1`` (killing two_sum's
    residual whenever an operand is constant) and CPU codegen
    fma-contracted the duplicated ``p = a*b`` into ``p + e`` (one
    rounding instead of two) — both silently corrupted compiled df64
    values by ~ulp/2 of the result while EAGER evaluation stayed exact.
    The ``_pin`` (full-width reduce_precision) in two_sum/quick_two_sum/
    two_prod blocks both.  This test pins jit-vs-EXACT (rationals) on
    the two trigger patterns plus jit exp accuracy."""
    import fractions

    r_hi = jnp.asarray(np.linspace(-0.34, 0.34, 64), jnp.float32)
    r_lo = jnp.asarray(np.linspace(1e-9, -1e-9, 64), jnp.float32)
    a = df.DF(r_hi, r_lo)

    # (2) the square: fma-contraction trigger
    j = jax.jit(lambda p: df.mul(p, p))(a)
    worst = 0.0
    for i in range(64):
        v = (fractions.Fraction(float(r_hi[i])) +
             fractions.Fraction(float(r_lo[i])))
        vj = (fractions.Fraction(float(np.asarray(j.hi)[i])) +
              fractions.Fraction(float(np.asarray(j.lo)[i])))
        worst = max(worst, abs(float(vj - v * v)))
    assert worst < 1e-15, worst

    # (1) add with a constant operand: reassociation trigger
    one = df.lift(jnp.ones_like(r_hi))
    je = jax.jit(lambda p: df.add(df.lift(jnp.ones_like(p.hi)), p))(a)
    ee = df.add(one, a)
    np.testing.assert_array_equal(np.asarray(je.hi), np.asarray(ee.hi))
    np.testing.assert_array_equal(np.asarray(je.lo), np.asarray(ee.lo))

    # end-to-end: jit exp at pair precision
    x = jnp.asarray(np.linspace(-2, 2, 64), jnp.float32)
    jx = jax.jit(lambda q: df.exp(df.lift(q)))(x)
    sj = np.asarray(jx.hi, np.float64) + np.asarray(jx.lo, np.float64)
    want = np.exp(np.asarray(x, np.float64))
    assert np.max(np.abs(sj - want) / want) < 1e-13


def test_df64_transcendental_saturation_guards():
    """Round-5 review: the transcendental rules must match base JAX's
    domain handling at the extremes — sigmoid saturates (no inf -> NaN
    through the EFT ops), expm1 overflows to inf, pow handles
    non-positive bases, tanh is the overflow-free form."""
    import jax.nn

    x = jnp.asarray([-100.0, -88.0, 0.0, 88.0, 100.0], jnp.float32)
    s = df.df64ify(jax.nn.sigmoid, to_native=False)(x)
    got = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(
        got, 1 / (1 + np.exp(-np.asarray(x, np.float64))), atol=1e-13)

    e = df.df64ify(jnp.expm1, to_native=False)(
        jnp.asarray([100.0, -100.0], jnp.float32))
    assert np.isinf(np.asarray(e.hi)[0])
    assert abs(float(e.hi[1]) + 1.0) < 1e-6

    pw = df.df64ify(lambda v: v ** 2.0, to_native=False)(
        jnp.asarray([-3.0, 0.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(pw.hi), [9.0, 0.0], atol=1e-6)

    t = df.df64ify(jnp.tanh, to_native=False)(
        jnp.asarray([-100.0, 100.0], jnp.float32))
    got = np.asarray(t.hi, np.float64) + np.asarray(t.lo, np.float64)
    np.testing.assert_allclose(got, [-1.0, 1.0], atol=1e-14)


def test_eft_nonfinite_matches_native():
    """Round-5 continuation review: the CORE pair ops must carry the base
    dtype's inf/NaN semantics instead of poisoning the hi word with NaN
    via ``inf - inf`` in the residual formulas (previously only the
    transcendental rules were guarded).  Also covers the Dekker-split
    overflow: ``two_prod`` with a finite operand above
    ``max_float / 4097`` produced a NaN residual for a product native
    f32 computes fine."""
    inf = np.float32(np.inf)
    L = lambda v: df.lift(jnp.float32(v))
    tf = lambda p: float(df.to_float(p))

    assert tf(df.add(L(inf), L(1.0))) == np.inf
    assert tf(df.sub(L(-inf), L(5.0))) == -np.inf
    assert tf(df.mul(L(inf), L(2.0))) == np.inf
    assert tf(df.div(L(inf), L(2.0))) == np.inf
    assert tf(df.div(L(1.0), L(0.0))) == np.inf
    assert tf(df.sqrt(L(inf))) == np.inf
    # genuine indeterminate forms still propagate NaN
    assert np.isnan(tf(df.add(L(inf), L(-inf))))
    assert np.isnan(tf(df.div(L(inf), L(inf))))
    assert np.isnan(tf(df.mul(L(np.float32(np.nan)), L(2.0))))
    # Dekker-split overflow: finite product stays finite (base-precision)
    assert abs(tf(df.mul(L(1e35), L(1e-10))) - 1e25) < 1e19
    # overflowing sum saturates to inf like native f32
    assert tf(df.add(L(3e38), L(3e38))) == np.inf


def test_df64ify_nonfinite_compare_and_minmax():
    """Comparisons against infinities (including ``jnp.isinf``, which
    lowers to ``eq(|x|, inf)``) must match native semantics, and
    max/min must propagate NaN like ``lax.max``/``lax.min``."""
    x = jnp.asarray([1.0, np.inf, -np.inf], jnp.float32)
    out = df.df64ify(lambda v: jnp.where(jnp.isinf(v), -1.0, v * 2.0))(x)
    np.testing.assert_array_equal(np.asarray(out), [2.0, -1.0, -1.0])
    lt = df.df64ify(lambda v: (v < 0).astype(jnp.float32))(x)
    np.testing.assert_array_equal(np.asarray(lt), [0.0, 0.0, 1.0])

    xn = jnp.asarray([np.nan, -2.0, 3.0], jnp.float32)
    mx = np.asarray(df.df64ify(lambda v: jnp.maximum(v, 0.0))(xn))
    assert np.isnan(mx[0]) and mx[1] == 0.0 and mx[2] == 3.0
    mn = np.asarray(df.df64ify(lambda v: jnp.minimum(v, 0.0))(xn))
    assert np.isnan(mn[0]) and mn[1] == -2.0 and mn[2] == 0.0


def test_df64ify_empty_reduction_and_half_precision_fallback():
    """``jnp.sum`` over a zero-length axis returns 0 (no trace-time
    IndexError), and half-precision (bf16/f16) arithmetic falls back to
    base evaluation per-op instead of KeyError-ing in the Dekker-split
    tables."""
    z = df.df64ify(lambda v: jnp.sum(v))(jnp.zeros((0,), jnp.float32))
    assert float(z) == 0.0

    def mixed(v):
        y = v.astype(jnp.bfloat16) * jnp.bfloat16(2.0)
        return jnp.sum(y.astype(jnp.float32) * v)

    out = df.df64ify(mixed)(jnp.asarray([1.0, 2.0], jnp.float32))
    assert abs(float(out) - 10.0) < 1e-5
