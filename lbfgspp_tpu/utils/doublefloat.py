"""Double-float ("df64") emulated high precision for TPU.

TPUs have no hardware f64; ``jax.config.x64`` is CPU-only.  This module
provides the classical error-free-transform arithmetic (Dekker 1971, Knuth
TAOCP 4.2.2, Hida-Li-Bailey's QD library) over *pairs* of native floats
``(hi, lo)`` with ``fl(hi + lo) == hi``, giving ~2x the mantissa of the base
dtype (f32 pairs: ~48 effective bits) out of ordinary VPU adds/muls — no
hardware support needed.

Why it exists here: the reference examples converge to ``max|x_i - 1| <=
1e-4`` on every run (example-rosenbrock-bracketing.cpp:50-54), but a pure-f32
solve stalls at the f32 *gradient rounding floor* (||g|| noise ~ 1e-4 for
Rosenbrock-type cancellation), leaving a fraction of batch instances just
outside the criterion.  Evaluating the objective gradient through df64
arithmetic removes that floor (noise ~ 1e-11) while every solver data
structure stays f32 — a few df64 "polish" iterations after the f32 solve
recover reference-grade solutions at TPU-native throughput (see
:func:`lbfgspp_tpu.batch.minimize_batched` ``polish_iters``).

Two layers:

* scalar/array pair ops: ``two_sum``, ``two_prod``, ``add``, ``mul``, ``div``,
  ``df_sum`` (error-compensated tree reduction);
* :func:`df64ify` — a jaxpr interpreter that re-evaluates an arbitrary jitted
  function with every arithmetic primitive replaced by its df64 rule
  (structure ops pass both words through; unknown primitives gracefully fall
  back to the hi word).  ``df64ify(jax.value_and_grad(f))`` therefore yields
  a *gradient evaluated in emulated f64* without rewriting ``f``.

Correctness notes: the error-free transforms require IEEE round-to-nearest
adds/muls without fused contraction, which XLA guarantees at the HLO level
(no fast-math reassociation on TPU); ``tests/test_doublefloat.py`` asserts
exactness of the transforms against f64 on every CI backend.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

try:                       # jaxpr types live in jax.extend.core on new jax
    from jax.extend.core import Literal as _Literal
except Exception:          # pragma: no cover
    from jax.core import Literal as _Literal

Array = jax.Array


class DF(NamedTuple):
    """A double-float number/array: value = hi + lo, with fl(hi+lo) = hi."""

    hi: Array
    lo: Array

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape


def lift(x) -> DF:
    """Promote a native float array to a df64 pair (exact)."""
    x = jnp.asarray(x)
    return DF(x, jnp.zeros_like(x))


def _split_const(dtype) -> float:
    # Dekker split factor 2^ceil(p/2) + 1 (p = mantissa bits incl. hidden).
    bits = {np.dtype(np.float32): 12, np.dtype(np.float64): 27}
    return float(2 ** bits[np.dtype(dtype)] + 1)


# The error-free transforms below PIN their rounded result behind a
# full-width ``lax.reduce_precision`` (a numeric identity XLA keeps as a
# real op) before using it in the residual formulas.  Without the pin,
# two compiler behaviors silently destroy the error terms under
# whole-graph jit (diagnosed round-5; eager per-op dispatch never
# triggers either, which hid the corruption for four rounds):
#   1. the HLO algebraic simplifier constant-reassociates
#      ``(x + c1) - c2 -> x + (c1 - c2)`` — so ``two_sum(1.0, x)``'s
#      ``bb = s - 1`` folds to ``x`` exactly and the residual collapses
#      to 0: any EFT chain with a CONSTANT operand (a Taylor series'
#      leading 1, an objective's literal) loses its lo word
#      (reproduced identically on CPU and TPU);
#   2. on CPU, fusion duplication recomputes ``p = a * b`` inside a
#      consumer where LLVM contracts ``p + e`` into ``fma(a, b, e)`` —
#      one rounding instead of two, inconsistent with the separately
#      computed ``p`` in the residual (verified: the corrupted jit
#      output matches the fma-emulated computation bit-for-bit).
# ``lax.optimization_barrier`` is NOT sufficient: XLA expands barriers
# before the fusion/codegen passes where (2) happens.  The pin costs
# one no-op-strength op per transform; the EFT identities are exact
# again under jit on both backends (tests/test_doublefloat.py pins
# jit-vs-exact).


def _pin(x: Array) -> Array:
    bits = {np.dtype(np.float32): (8, 23), np.dtype(np.float64): (11, 52)}
    e, m = bits[np.dtype(x.dtype)]
    return jax.lax.reduce_precision(x, e, m)


def _guard_err(err: Array) -> Array:
    """Pin an EFT residual to the base dtype's inf/NaN semantics.

    The residual formulas compute ``inf - inf`` whenever the rounded
    result overflows (or an operand is infinite) and ``inf * 0`` in the
    pair cross terms, poisoning the error word — and, one
    ``quick_two_sum`` later, the HI word — with NaN where native
    arithmetic yields a clean ``inf``.  Dekker's splitting likewise
    overflows for finite operands above ``max_float / (2^ceil(p/2)+1)``
    even when the product itself is finite.  A non-finite residual
    carries no information (the pair just degrades to base precision
    exactly where base arithmetic saturates), so it is zeroed; a NaN
    HI word propagates by itself.  Finite paths are bit-unchanged (the
    select returns ``err`` as-is), and the cost is kept to ONE
    ``is_finite`` + ONE select per pair op: guarding the folded
    residual entering the renormalization keeps the HI word clean
    (``quick_two_sum(s, finite)`` preserves ``s = +-inf``), while the
    renormalization's own residual is allowed to go NaN under an
    infinite HI word — pairs ride as ``(+-inf, NaN)`` and
    :func:`to_float` collapses the meaningless lo word once at the
    boundary (invariant: finite hi => finite lo)."""
    return jnp.where(jnp.isfinite(err), err, jnp.zeros_like(err))


def two_sum(a: Array, b: Array):
    """Error-free sum: a + b = s + err exactly (Knuth)."""
    s = _pin(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a: Array, b: Array):
    """Error-free sum assuming |a| >= |b| (Dekker)."""
    s = _pin(a + b)
    err = b - (s - a)
    return s, err


def two_prod(a: Array, b: Array):
    """Error-free product via Dekker splitting: a * b = p + err exactly."""
    p = _pin(a * b)
    c = _split_const(p.dtype) * a
    ah = c - (c - a)
    al = a - ah
    c = _split_const(p.dtype) * b
    bh = c - (c - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(x: DF, y: DF) -> DF:
    """Pair sum (QD's sloppy add: two_sum + residual fold + renorm)."""
    s, e = two_sum(x.hi, y.hi)
    e = _guard_err(e + (x.lo + y.lo))   # NaN residual under s = +-inf
    s, e = quick_two_sum(s, e)
    return DF(s, e)


def neg(x: DF) -> DF:
    """Pair negation (exact: both words flip sign)."""
    return DF(-x.hi, -x.lo)


def sub(x: DF, y: DF) -> DF:
    """Pair difference: ``add(x, neg(y))``."""
    return add(x, neg(y))


def mul(x: DF, y: DF) -> DF:
    """Pair product (two_prod + cross terms + renorm, Dekker/QD)."""
    p, e = two_prod(x.hi, y.hi)
    # the fold hits Dekker-split overflow and inf * 0 = NaN cross terms
    e = _guard_err(e + (x.hi * y.lo + x.lo * y.hi))
    p, e = quick_two_sum(p, e)
    return DF(p, e)


def _finite_or_plain(out: DF, plain: Array) -> DF:
    """Defer to the base-dtype result wherever it is non-finite (the df
    refinement formulas turn inf/NaN into NaN via inf - inf)."""
    ok = jnp.isfinite(plain)
    return DF(jnp.where(ok, out.hi, plain),
              jnp.where(ok, out.lo, jnp.zeros_like(plain)))


def div(x: DF, y: DF) -> DF:
    # One coarse quotient + two Newton-style corrections (QD's div).
    q1 = x.hi / y.hi
    r = sub(x, mul(lift(q1), y))
    q2 = r.hi / y.hi
    r = sub(r, mul(lift(q2), y))
    q3 = r.hi / y.hi
    s, e = quick_two_sum(q1, q2)
    # y == 0 / inf operands: the correction chain is NaN-poisoned
    # (q1 = inf makes the residual inf - inf); the base quotient already
    # carries the right inf/NaN semantics.
    return _finite_or_plain(add(DF(s, e), lift(q3)), q1)


def sqrt(x: DF) -> DF:
    # Karp-Markstein: y ~ 1/sqrt(x); s = x*y; refine.  Non-finite /
    # non-positive inputs (and the near-max edge where safe**2 rounds to
    # inf) defer to the base sqrt's own semantics.
    s0 = jnp.sqrt(x.hi)
    ok = (s0 > 0) & jnp.isfinite(s0)
    safe = jnp.where(ok, s0, 1.0)
    d = sub(x, mul(DF(safe, jnp.zeros_like(safe)),
                   DF(safe, jnp.zeros_like(safe))))
    corr = d.hi / (2.0 * safe)
    hi, lo = quick_two_sum(safe, corr)
    ok &= jnp.isfinite(hi)
    return DF(jnp.where(ok, hi, s0), jnp.where(ok, lo, 0.0))


def to_float(x: DF) -> Array:
    """Round back to the base dtype.

    A non-finite hi word may carry a NaN lo (the renormalization's
    residual under ``+-inf`` is ``inf - inf``; see :func:`_guard_err`) —
    the hi word alone is the native-semantics value there."""
    if not jnp.issubdtype(jnp.asarray(x.hi).dtype, jnp.inexact):
        return x.hi           # bool/int words carry no error term
    return jnp.where(jnp.isfinite(x.hi), x.hi + x.lo, x.hi)


# ---------------------------------------------------------------------------
# transcendentals (round-5: without these, exp/log objectives silently fell
# back to hi-word evaluation — base-precision — and the df64 polish could
# not see sub-ulp decreases on them; the logreg/lasso production families
# are exactly such objectives)
# ---------------------------------------------------------------------------

import fractions as _fractions

# ln 2 to ~200 bits as an exact rational (a plain Python float only has 53
# bits, which would cap the f64-pair exp range reduction at ~1e-16).
_LN2_FRAC = _fractions.Fraction(
    "0.69314718055994530941723212145817656807550013436025525412068")
_LN2 = float(_LN2_FRAC)


def _const_df(value_fraction, dtype) -> DF:
    """Split an exact rational constant into a (hi, lo) pair for dtype."""
    hi = np.asarray(float(value_fraction), dtype).item()
    lo = np.asarray(float(value_fraction - _fractions.Fraction(hi)),
                    dtype).item()
    return DF(jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))


# The exact-rational splits are pure Python Fraction arithmetic re-run at
# every trace of every transcendental rule (each log costs 2 exps, and
# log1p/pow/logistic/tanh all route through exp) — cache per dtype.
@lru_cache(maxsize=None)
def _const_pair_cached(num: int, den: int, dtype_name: str):
    return _const_df(_fractions.Fraction(num, den), np.dtype(dtype_name))


def _ln2_pair(dtype) -> DF:
    return _const_pair_cached(_LN2_FRAC.numerator, _LN2_FRAC.denominator,
                              np.dtype(dtype).name)


def _inv_fact_table(dtype, terms):
    import math
    name = np.dtype(dtype).name
    return [_const_pair_cached(1, math.factorial(i), name)
            for i in range(terms + 1)]


def exp(x: DF) -> DF:
    """df exp: range-reduce ``exp(x) = 2^k exp(r)`` with ``r = x - k ln2``
    (|r| <= ln2/2; the k*ln2 product is pair-exact via ``two_prod``), then
    the Taylor series in df arithmetic with exact reciprocal-factorial
    pair constants.  Pair-precision accurate (~2^-47 rel for f32 pairs,
    ~2^-105 for f64 pairs at 26 terms)."""
    dt = jnp.asarray(x.hi).dtype
    ln2 = _ln2_pair(dt)
    k = jnp.round(x.hi / jnp.asarray(_LN2, dt))
    r = sub(x, mul(DF(k, jnp.zeros_like(k)), ln2))
    terms = 14 if dt == np.dtype(np.float32) else 26
    inv_fact = _inv_fact_table(dt, terms)
    acc = lift(jnp.ones_like(x.hi))
    term = lift(jnp.ones_like(x.hi))
    for i in range(1, terms + 1):
        term = mul(term, r)
        c = inv_fact[i]
        acc = add(acc, mul(term, DF(jnp.broadcast_to(c.hi, term.hi.shape),
                                    jnp.broadcast_to(c.lo, term.lo.shape))))
    # exact power of two: XLA's f32 exp2 is a polynomial approximation and
    # returns e.g. 2^13 = 8192.004 (measured round-5 — a 4.8e-7 error that
    # would swamp the pair); ldexp scales the exponent field exactly.
    scale = jnp.ldexp(jnp.ones_like(x.hi), k.astype(jnp.int32))
    out = DF(acc.hi * scale, acc.lo * scale)
    # non-finite / extreme inputs: defer to the base exp semantics
    plain = jnp.exp(x.hi)
    ok = jnp.isfinite(x.hi) & jnp.isfinite(plain) & (plain > 0)
    return DF(jnp.where(ok, out.hi, plain),
              jnp.where(ok, out.lo, jnp.zeros_like(plain)))


def log(x: DF) -> DF:
    """df log: base-precision seed + one Newton step ``y1 = y0 +
    (x * exp(-y0) - 1)`` — quadratic convergence lands at pair
    precision."""
    y0 = jnp.log(x.hi)
    ok = (x.hi > 0) & jnp.isfinite(y0)
    y0s = jnp.where(ok, y0, jnp.zeros_like(y0))
    y = DF(y0s, jnp.zeros_like(y0s))
    # Two steps: the seed's ~eps_base absolute error leaves ~eps_base^2/2
    # absolute after one step — still large RELATIVE to small outputs
    # (log1p near zero); the second step removes it.
    for _ in range(2):
        e = exp(neg(y))
        y = add(y, sub(mul(x, e), lift(jnp.ones_like(y0s))))
    return DF(jnp.where(ok, y.hi, y0), jnp.where(ok, y.lo, 0.0))


def log1p(x: DF) -> DF:
    # add(1, x) is pair-exact (two_sum keeps the residual in lo), so the
    # tiny-x cancellation the scalar log1p exists for never happens here.
    return log(add(lift(jnp.ones_like(x.hi)), x))


def expm1(x: DF) -> DF:
    # exp(x) is pair-accurate near 1, and the df sub is exact — the
    # classic expm1 cancellation is absorbed by the lo word.  Guard the
    # overflow region: exp's extreme path returns (inf, 0) and the EFT
    # sub would produce inf - inf = NaN in the error term; defer to the
    # base expm1 there (round-5 review finding).
    out = sub(exp(x), lift(jnp.ones_like(x.hi)))
    # dtype-aware cutoff: stay on the pair path up to just below exp's
    # own overflow (f32 ~88, f64 ~709) instead of a fixed 80 that threw
    # away pair accuracy on f64 pairs for x in (80, 709).
    cut = 80.0 if jnp.asarray(x.hi).dtype == np.dtype(np.float32) else 700.0
    big = x.hi > cut
    plain = jnp.expm1(x.hi)
    return DF(jnp.where(big, plain, out.hi),
              jnp.where(big, jnp.zeros_like(plain), out.lo))


def logistic(x: DF) -> DF:
    # Numerically-stable two-branch form: e = exp(-|x|) <= 1 never
    # overflows (the naive 1/(1 + exp(-x)) produced inf -> NaN through
    # the EFT ops for x < ~-88, where the base sigmoid correctly
    # saturates to 0 — round-5 review finding).
    #   x >= 0:  sigma = 1 / (1 + e)
    #   x <  0:  sigma = e / (1 + e)
    ax = DF(jnp.abs(x.hi), jnp.where(x.hi < 0, -x.lo, x.lo))
    e = exp(neg(ax))
    one = lift(jnp.ones_like(x.hi))
    denom = add(one, e)
    pos = div(one, denom)
    negb = div(e, denom)
    nonneg = x.hi >= 0
    return DF(jnp.where(nonneg, pos.hi, negb.hi),
              jnp.where(nonneg, pos.lo, negb.lo))


def tanh(x: DF) -> DF:
    # (e^{2x} - 1) / (e^{2x} + 1) on |x| via the overflow-free e <= 1
    # form, saturated beyond |x| > 20 where the result is +-1 to far
    # below pair precision.
    ax = DF(jnp.abs(x.hi), jnp.where(x.hi < 0, -x.lo, x.lo))
    e2 = exp(neg(add(ax, ax)))               # e^{-2|x|} <= 1
    one = lift(jnp.ones_like(x.hi))
    t = div(sub(one, e2), add(one, e2))      # tanh(|x|)
    # saturate only where 1 - tanh ~ 2e^{-2|x|} is below PAIR precision
    # (f32 pairs ~2^-48: |x| > 17; f64 pairs ~2^-105: |x| > 37) — the
    # old fixed 20.0 zeroed a lo word that was still ~1e-18..1e-32 for
    # f64 pairs in (20, 37).
    sat_cut = (20.0 if jnp.asarray(x.hi).dtype == np.dtype(np.float32)
               else 40.0)
    sat = jnp.abs(x.hi) > sat_cut
    hi = jnp.where(sat, jnp.ones_like(t.hi), t.hi)
    lo = jnp.where(sat, jnp.zeros_like(t.lo), t.lo)
    sgn = jnp.sign(x.hi)
    return DF(sgn * hi, sgn * lo)


def _tree_fold(x: DF, axis: int) -> DF:
    """Compensated reduction along ``axis`` by repeated halving: log2(n)
    vectorized df adds — accurate and TPU-parallel (no sequential carry)."""
    hi = jnp.moveaxis(x.hi, axis, 0)
    lo = jnp.moveaxis(x.lo, axis, 0)
    n = hi.shape[0]
    if n == 0:            # native reduce_sum over an empty axis is 0
        z = jnp.zeros(hi.shape[1:], hi.dtype)
        return DF(z, z)
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            zpad = jnp.zeros((pad,) + hi.shape[1:], hi.dtype)
            hi = jnp.concatenate([hi, zpad], axis=0)
            lo = jnp.concatenate([lo, zpad], axis=0)
        a = DF(hi[:half], lo[:half])
        b = DF(hi[half:], lo[half:])
        s = add(a, b)
        hi, lo = s.hi, s.lo
        n = half
    return DF(hi[0], lo[0])


def df_sum(x: DF, axes) -> DF:
    """Compensated sum over ``axes`` (tuple of ints)."""
    out = x
    for ax in sorted(axes, reverse=True):
        out = _tree_fold(out, ax)
    return out


def df_dot(a: DF, b: DF) -> DF:
    """Compensated dot product of two 1-D df vectors."""
    return df_sum(mul(a, b), (0,))


# ---------------------------------------------------------------------------
# jaxpr interpreter
# ---------------------------------------------------------------------------

def _rule_structural(prim, *args, **params):
    """Apply the primitive separately to hi and lo words (exact for all
    data-movement ops).  Integer/bool operands (gather indices, dynamic
    slice starts, ...) carry no error term — their *hi* word feeds both
    binds, otherwise the lo pass would index with zeros."""
    def lo_word(a):
        if jnp.issubdtype(jnp.asarray(a.hi).dtype, jnp.inexact):
            return a.lo
        return a.hi
    his = prim.bind(*[a.hi for a in args], **params)
    los = prim.bind(*[lo_word(a) for a in args], **params)
    if prim.multiple_results:
        return [DF(h, l) for h, l in zip(his, los)]
    return DF(his, los)


_STRUCTURAL = {
    "reshape", "broadcast_in_dim", "transpose", "slice", "squeeze",
    "concatenate", "rev", "expand_dims", "dynamic_slice", "pad",
    "gather", "copy", "stop_gradient",
    # scatter-add appears as the AD transpose of gather/slicing; with the
    # unique indices AD generates it is pure data movement, so per-word
    # application is exact (colliding adds would round per word — still
    # far better than the f32 fallback).
    "scatter-add", "scatter", "dynamic_update_slice",
}


def _rule_select_n(prim, which, *cases, **params):
    hi = prim.bind(which.hi, *[c.hi for c in cases], **params)
    lo = prim.bind(which.hi, *[c.lo for c in cases], **params)
    return DF(hi, lo)


def _rule_integer_pow(prim, x, *, y, **_kw):
    if y == 0:
        return lift(jnp.ones_like(x.hi))
    neg_pow = y < 0
    k = -y if neg_pow else y
    # Square-and-multiply in df arithmetic.
    result = None
    base = x
    while k:
        if k & 1:
            result = base if result is None else mul(result, base)
        k >>= 1
        if k:
            base = mul(base, base)
    if neg_pow:
        result = div(lift(jnp.ones_like(x.hi)), result)
    return result


def _rule_reduce_sum(prim, x, *, axes, **_kw):
    return df_sum(x, axes)


def _rule_dot_general(prim, a, b, *, dimension_numbers, **params):
    """Compensated dot_general: expand products with two_prod and tree-sum
    over the contraction axes.  Memory grows by the contraction size, so this
    is meant for the solver-scale matvecs/dots, not giant GEMMs."""
    (lc, rc), (lb, rb) = dimension_numbers
    # Move batch then contraction dims to front on both operands.
    def arrange(x, batch, contract):
        other = [d for d in range(x.hi.ndim)
                 if d not in batch and d not in contract]
        perm = list(batch) + list(contract) + other
        return DF(jnp.transpose(x.hi, perm), jnp.transpose(x.lo, perm))
    a2 = arrange(a, lb, lc)
    b2 = arrange(b, rb, rc)
    nb, nc = len(lb), len(lc)
    # Shapes: a2 [B..., C..., M...], b2 [B..., C..., N...]
    a_sh, b_sh = a2.hi.shape, b2.hi.shape
    bshape = a_sh[:nb]
    cshape = a_sh[nb:nb + nc]
    mshape = a_sh[nb + nc:]
    nshape = b_sh[nb + nc:]
    ax = DF(a2.hi.reshape(bshape + cshape + mshape + (1,) * len(nshape)),
            a2.lo.reshape(bshape + cshape + mshape + (1,) * len(nshape)))
    bx = DF(b2.hi.reshape(bshape + cshape + (1,) * len(mshape) + nshape),
            b2.lo.reshape(bshape + cshape + (1,) * len(mshape) + nshape))
    prod = mul(ax, bx)
    axes = tuple(range(nb, nb + nc))
    return df_sum(prod, axes)


def _fallback(prim, *args, **params):
    """Evaluate through the hi words only (rounds to base precision)."""
    out = prim.bind(*[to_float(a) for a in args], **params)
    if prim.multiple_results:
        return [lift(o) for o in out]
    return lift(out)


def _rule_call(prim, *args, **params):
    inner = params.get("jaxpr", None) or params.get("call_jaxpr", None)
    if inner is None:
        return _fallback(prim, *args, **params)
    if hasattr(inner, "jaxpr"):           # ClosedJaxpr
        return _eval_jaxpr_df(inner.jaxpr, inner.consts, args)
    return _eval_jaxpr_df(inner, [], args)


_ARITH_RULES = {
    "add": lambda p, a, b, **kw: add(a, b),
    "sub": lambda p, a, b, **kw: sub(a, b),
    "mul": lambda p, a, b, **kw: mul(a, b),
    "div": lambda p, a, b, **kw: div(a, b),
    "neg": lambda p, a, **kw: neg(a),
    "sqrt": lambda p, a, **kw: sqrt(a),
    "abs": lambda p, a, **kw: DF(jnp.where(a.hi < 0, -a.hi, a.hi),
                                 jnp.where(a.hi < 0, -a.lo, a.lo)),
    "max": lambda p, a, b, **kw: _df_minmax(a, b, True),
    "min": lambda p, a, b, **kw: _df_minmax(a, b, False),
    "integer_pow": _rule_integer_pow,
    "reduce_sum": _rule_reduce_sum,
    "dot_general": _rule_dot_general,
    "select_n": _rule_select_n,
    # transcendentals (round-5): pair-accurate rules — without them these
    # primitives fell through to the hi-word fallback and any exp/log
    # objective lost the df64 polish's sub-ulp resolution entirely
    "exp": lambda p, a, **kw: exp(a),
    "log": lambda p, a, **kw: log(a),
    "log1p": lambda p, a, **kw: log1p(a),
    "expm1": lambda p, a, **kw: expm1(a),
    "logistic": lambda p, a, **kw: logistic(a),
    "tanh": lambda p, a, **kw: tanh(a),
    "exp2": lambda p, a, **kw: exp(mul(a, _ln2_pair(
        jnp.asarray(a.hi).dtype))),
    "log2": lambda p, a, **kw: div(log(a), _ln2_pair(
        jnp.asarray(a.hi).dtype)),
    "pow": lambda p, a, b, **kw: _pow_rule(a, b),
}


def _pow_rule(a: DF, b: DF) -> DF:
    # exp(b * log a) is only valid for a > 0; base JAX pow handles
    # non-positive bases (integral exponents, a == 0) — defer to it
    # there instead of emitting NaN (round-5 review finding).
    out = exp(mul(b, log(a)))
    ok = a.hi > 0
    plain = jnp.power(to_float(a), to_float(b))
    return DF(jnp.where(ok, out.hi, plain),
              jnp.where(ok, out.lo, jnp.zeros_like(plain)))

_CALLS = {"pjit", "closed_call", "custom_jvp_call", "custom_vjp_call",
          "custom_vjp_call_jaxpr", "remat", "checkpoint"}

_CMP = {"eq": jnp.equal, "ne": jnp.not_equal, "lt": jnp.less,
        "le": jnp.less_equal, "gt": jnp.greater, "ge": jnp.greater_equal}

# Dtypes with an error-free-transform implementation (the Dekker split
# constants and reduce_precision pins are defined for these).  Half
# precisions (f16/bf16) fall back to base evaluation per-op instead of
# KeyError-ing at trace time inside _pin/_split_const.
_DF_DTYPES = frozenset({np.dtype(np.float32), np.dtype(np.float64)})


def _df_supported(x) -> bool:
    return np.dtype(jnp.asarray(x).dtype) in _DF_DTYPES


def _df_ge(a: DF, b: DF):
    d = sub(a, b)
    return (d.hi > 0) | ((d.hi == 0) & (d.lo >= 0))


def _df_select(pred, a: DF, b: DF) -> DF:
    return DF(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def _df_minmax(a: DF, b: DF, is_max: bool) -> DF:
    # lax.max/min propagate NaN from EITHER operand; the _df_ge select
    # alone would silently drop a NaN operand (its comparison is False).
    out = _df_select(_df_ge(a, b), a, b) if is_max else \
        _df_select(_df_ge(a, b), b, a)
    bad = jnp.isnan(a.hi) | jnp.isnan(b.hi)
    return DF(jnp.where(bad, a.hi + b.hi, out.hi),
              jnp.where(bad, jnp.zeros_like(out.lo), out.lo))


def _rule_cmp(prim, a, b, **params):
    # Compare on the full df values (exact: compare the difference).
    if not _df_supported(a.hi):
        out = _CMP[prim.name](to_float(a), to_float(b))
        return DF(out, jnp.zeros_like(out))
    d = sub(a, b)
    out = _CMP[prim.name](to_float(d), jnp.zeros_like(d.hi))
    # inf - inf (both operands the same infinity) is NaN: every df
    # comparison would be False there — e.g. jnp.isinf lowers to
    # eq(|x|, inf) and would always deny.  Fall back to the native hi
    # comparison exactly where the difference is NaN but neither
    # operand is (NaN operands keep IEEE all-False/ne-True semantics).
    use_native = jnp.isnan(d.hi) & ~(jnp.isnan(a.hi) | jnp.isnan(b.hi))
    out = jnp.where(use_native, _CMP[prim.name](a.hi, b.hi), out)
    return DF(out, jnp.zeros_like(out))


def _eval_jaxpr_df(jaxpr, consts, args):
    env = {}

    def read(v):
        if isinstance(v, _Literal):
            return lift(jnp.asarray(v.val))
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, lift(c))
    flat_args = list(args)
    for v, a in zip(jaxpr.invars, flat_args):
        write(v, a if isinstance(a, DF) else lift(a))

    def all_float(vals):
        return all(_df_supported(v.hi) for v in vals)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name in _CALLS:
            out = _rule_call(eqn.primitive, *invals, **eqn.params)
        elif name == "convert_element_type":
            dst = eqn.params["new_dtype"]
            if all_float(invals) and np.dtype(dst) in _DF_DTYPES:
                out = DF(invals[0].hi.astype(dst), invals[0].lo.astype(dst))
            else:
                out = _fallback(eqn.primitive, *invals, **eqn.params)
        elif name in _ARITH_RULES:
            # df rules apply to floating data only; integer/bool arithmetic
            # is exact natively.
            numeric = invals if name != "select_n" else invals[1:]
            if all_float(numeric):
                out = _ARITH_RULES[name](eqn.primitive, *invals,
                                         **eqn.params)
            else:
                out = _fallback(eqn.primitive, *invals, **eqn.params)
        elif name in _CMP:
            out = _rule_cmp(eqn.primitive, *invals, **eqn.params)
        elif name in _STRUCTURAL:
            out = _rule_structural(eqn.primitive, *invals, **eqn.params)
        else:
            out = _fallback(eqn.primitive, *invals, **eqn.params)
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, out):
                write(v, o)
        else:
            write(eqn.outvars[0], out)

    return [read(v) for v in jaxpr.outvars]


def df64ify(fun: Callable, to_native: bool = True) -> Callable:
    """Re-evaluate ``fun`` with all arithmetic in df64 (emulated f64).

    Traces ``fun`` to a jaxpr at call time and interprets every primitive
    with its double-float rule; data movement passes both words through and
    unsupported primitives fall back to base precision for that op only.
    With ``to_native`` (default) the outputs are rounded back to the base
    dtype — e.g. ``df64ify(jax.value_and_grad(f))`` is a drop-in
    ``fun_and_grad`` whose gradient carries ~2x mantissa accuracy.
    """

    def wrapped(*args):
        closed = jax.make_jaxpr(fun)(*args)
        flat_args, _ = jax.tree_util.tree_flatten(args)
        outs = _eval_jaxpr_df(closed.jaxpr, closed.consts,
                              [lift(a) for a in flat_args])
        if to_native:
            outs = [to_float(o) for o in outs]
        else:
            outs = list(outs)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(
                jax.eval_shape(fun, *args)), outs)

    return wrapped


def df64_fun_and_grad(fun: Callable) -> Callable:
    """``x -> (fx, grad)`` evaluated through df64 arithmetic.

    The returned callable is a drop-in for the solvers' ``fun_and_grad``:
    inputs and outputs are native f32, but every add/mul/sum inside both the
    objective and its AD transpose runs in double-float, so the gradient is
    accurate to ~1e-11 relative instead of the f32 ~1e-5 floor.
    """
    return df64ify(jax.value_and_grad(fun))


def df64_pair_fun_and_grad(fun: Callable = None,
                           fun_and_grad: Callable = None) -> Callable:
    """Lift ``fun`` to the *paired* parameter space ``x2 = [hi; lo]``.

    Near an optimum the useful quasi-Newton step is often smaller than
    ``ulp(x)`` — in plain f32 every trial point rounds back to ``x`` and no
    line search can make progress (the f32 polish dead-end).  Optimizing
    over a double-float pair removes the wall: the solver sees ``2n``
    ordinary f32 variables, but the objective evaluates at the *exact* sum
    ``hi + lo`` in df64 arithmetic, so sub-ulp progress accumulates in the
    ``lo`` word.  ``dF/dhi = dF/dlo = f'(hi + lo)`` exactly, so the
    returned gradient is the true df64 gradient duplicated on both halves.

    Returns a ``fun_and_grad`` over ``[2n]`` vectors; combine the halves
    with :func:`pair_to_float` when done.  Pass ``fun_and_grad`` instead of
    ``fun`` to pair-lift a hand-written gradient function.
    """
    vg = fun_and_grad if fun_and_grad is not None else jax.value_and_grad(fun)

    def fg2(x2):
        n = x2.shape[0] // 2
        hi, lo = x2[:n], x2[n:]
        s, e = two_sum(hi, lo)
        closed = jax.make_jaxpr(vg)(s)
        fx, g = _eval_jaxpr_df(closed.jaxpr, closed.consts, [DF(s, e)])
        g1 = to_float(g)
        return to_float(fx), jnp.concatenate([g1, g1])

    return fg2


def pair_to_float(x2: Array) -> Array:
    """Collapse a paired iterate ``[hi; lo]`` back to the base dtype."""
    n = x2.shape[0] // 2
    return x2[:n] + x2[n:]
