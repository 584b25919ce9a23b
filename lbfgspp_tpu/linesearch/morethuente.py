"""Moré-Thuente line search as a fixed-shape ``lax.while_loop``.

Faithful TPU re-expression of the reference implementation
(/root/reference/include/LBFGSpp/LineSearchMoreThuente.h): the psi-function
formulation, the 3-case bracketing-interval update, the 4-case step selection
with quadratic/cubic interpolation, the step_min/step_max safeguards and the
forced-bisection rule when the interval fails to shrink by 0.66 twice.  Every
`if` in the reference maps to a `jnp.where` with the same predicate and the
same evaluation order, so iteration counts track the reference bit-for-bit in
f64.  Exceptions (LineSearchMoreThuente.h:360-377) become status codes.

This search serves both solvers and honors ``step_max``, making it the
default for L-BFGS-B (LBFGSB.h:22).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from ..types import LineSearchResult, Status

Array = jax.Array


def _quad_minimizer_fga(a, b, fa, ga, fb):
    """Minimizer of the quadratic interpolating (fa, ga, fb)
    (LineSearchMoreThuente.h:34-39, used for case I)."""
    ba = b - a
    w = 0.5 * ba * ga / (fa - fb + ba * ga)
    return a + w * ba


def _quad_minimizer_gg(a, b, ga, gb):
    """Minimizer of the quadratic interpolating (ga, gb)
    (LineSearchMoreThuente.h:46-50, cases II/III)."""
    w = ga / (ga - gb)
    return a + w * (b - a)


def _cubic_minimizer(a, b, fa, fb, ga, gb, dtype):
    """Local minimizer of the cubic interpolating (fa, ga, fb, gb), plus an
    existence flag (LineSearchMoreThuente.h:55-116).

    All branches are evaluated and selected with ``where``; arguments of
    ``sqrt`` are clamped at 0 in not-taken branches to avoid spurious NaNs
    (the reference only evaluates them when the guard holds).
    """
    eps = jnp.finfo(dtype).eps
    apb = a + b
    ba = b - a
    ba2 = ba * ba
    fba = fb - fa
    gba = gb - ga
    z3 = (ga + gb) * ba - 2.0 * fba
    z2 = 0.5 * (gba * ba2 - 3.0 * apb * z3)
    z1 = fba * ba2 - apb * z2 - (a * apb + b * b) * z3

    # Degenerate cubic -> quadratic (LineSearchMoreThuente.h:72-80)
    quad_case = (jnp.abs(z3) < eps * jnp.abs(z2)) | \
                (jnp.abs(z3) < eps * jnp.abs(z1))
    quad_exists = z2 * ba > 0.0
    z2_safe = jnp.where(z2 == 0.0, jnp.ones((), dtype), z2)
    quad_val = jnp.where(quad_exists, -0.5 * z1 / z2_safe, b)

    # Proper cubic (LineSearchMoreThuente.h:83-115)
    z3_safe = jnp.where(z3 == 0.0, jnp.ones((), dtype), z3)
    u = z2 / (3.0 * z3_safe)
    v = z1 / z2_safe
    u_safe = jnp.where(u == 0.0, jnp.ones((), dtype), u)
    v_safe = jnp.where(v == 0.0, jnp.ones((), dtype), v)
    vu = v / u_safe
    cubic_exists = vu <= 1.0

    # |u| >= |v| branch: w = 1 + sqrt(1 - v/u); r1 = -u*w, r2 = -v/w
    w = 1.0 + jnp.sqrt(jnp.maximum(1.0 - vu, 0.0))
    r1a = -u * w
    r2a = -v / w
    # |u| < |v| branch: sqrt(delta) = sqrt|u| sqrt|v| sqrt(1 - u/v)
    sqrtd = jnp.sqrt(jnp.abs(u)) * jnp.sqrt(jnp.abs(v)) * \
        jnp.sqrt(jnp.maximum(1.0 - u / v_safe, 0.0))
    r1b = -u - sqrtd
    r2b = -u + sqrtd
    use_a = jnp.abs(u) >= jnp.abs(v)
    r1 = jnp.where(use_a, r1a, r1b)
    r2 = jnp.where(use_a, r2a, r2b)
    cubic_val = jnp.where(z3 * ba > 0.0, jnp.maximum(r1, r2),
                          jnp.minimum(r1, r2))
    cubic_val = jnp.where(cubic_exists, cubic_val, b)

    value = jnp.where(quad_case, quad_val, cubic_val)
    exists = jnp.where(quad_case, quad_exists, cubic_exists)
    return value, exists


def _step_selection(al, au, at, fl, fu, ft, gl, gu, gt, dtype):
    """Next trial step from the current interval and trial data
    (LineSearchMoreThuente.h:120-189)."""
    deltal = jnp.asarray(1.1, dtype)
    deltau = jnp.asarray(0.66, dtype)

    mid = (al + at) / 2.0

    ac, ac_exists = _cubic_minimizer(al, at, fl, ft, gl, gt, dtype)
    aq = _quad_minimizer_fga(al, at, fl, gl, ft)

    # Case 1: ft > fl (LineSearchMoreThuente.h:142-149)
    res1 = jnp.where(
        ~ac_exists, aq,
        jnp.where(jnp.abs(ac - al) < jnp.abs(aq - al), ac, (aq + ac) / 2.0))

    a_s = _quad_minimizer_gg(al, at, gl, gt)
    # Case 2: ft <= fl, gt * gl < 0 (LineSearchMoreThuente.h:152-155)
    res2 = jnp.where(jnp.abs(ac - at) >= jnp.abs(a_s - at), ac, a_s)

    # Case 3: ft <= fl, gt * gl >= 0, |gt| < |gl|
    # (LineSearchMoreThuente.h:158-175)
    prefer_ac = ac_exists & ((ac - at) * (at - al) > 0.0) & \
        (jnp.abs(ac - at) < jnp.abs(a_s - at))
    res3_raw = jnp.where(prefer_ac, ac, a_s)
    cap3 = at + deltau * (au - at)
    res3 = jnp.where(at > al, jnp.minimum(cap3, res3_raw),
                     jnp.maximum(cap3, res3_raw))

    # Case 4: |gt| >= |gl| (LineSearchMoreThuente.h:177-188)
    extrap = at + deltal * (at - al)
    ae, _ = _cubic_minimizer(at, au, ft, fu, gt, gu, dtype)
    res4 = jnp.where(at > al, jnp.minimum(cap3, ae), jnp.maximum(cap3, ae))
    res4 = jnp.where(jnp.isfinite(au) & jnp.isfinite(fu) & jnp.isfinite(gu),
                     res4, extrap)

    case1 = ft > fl
    case2 = gt * gl < 0.0
    case3 = jnp.abs(gt) < jnp.abs(gl)
    res = jnp.where(case1, res1,
                    jnp.where(case2, res2, jnp.where(case3, res3, res4)))
    # ft or gt infinite -> midpoint (LineSearchMoreThuente.h:131-132)
    res = jnp.where(jnp.isfinite(ft) & jnp.isfinite(gt), res, mid)
    # al == au -> al (LineSearchMoreThuente.h:127-128)
    return jnp.where(al == au, al, res)


class _MTCarry(NamedTuple):
    step: Array
    fx: Array
    dg: Array
    x: Array
    grad: Array
    # Bracketing interval state
    i_lo: Array
    i_hi: Array
    fi_lo: Array
    fi_hi: Array
    gi_lo: Array
    gi_hi: Array
    psi_lo: Array
    # Best-so-far (step = i_lo) objective state; the point itself is
    # reconstructed on the exhaustion exit (fg is pure)
    fx_lo: Array
    dg_lo: Array
    # Safeguard status
    bracketed: Array
    use_smin_sg: Array
    i_width: Array
    i_width_prev: Array
    shrink_fail: Array
    it: Array
    done: Array
    nfev: Array


def morethuente(fg, param, xp: Array, drt: Array, step_max, step0, fx0: Array,
                grad0: Array, dg0: Array,
                axis_name: Optional[str] = None) -> LineSearchResult:
    """Run the Moré-Thuente search from ``xp`` along ``drt``.

    Arguments mirror the unified reference signature
    (LineSearchMoreThuente.h:213-216); ``fg`` is the ``x -> (fx, grad)``
    oracle.  Returns the accepted point, or the best-so-far (``_lo``) state
    when ``max_linesearch`` trials are exhausted
    (LineSearchMoreThuente.h:602-614).
    """
    dtype = xp.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    step_min = jnp.asarray(param.min_step, dtype)
    step_max = jnp.asarray(step_max, dtype)
    step0 = jnp.asarray(step0, dtype)
    ftol = jnp.asarray(param.ftol, dtype)
    wolfe = jnp.asarray(param.wolfe, dtype)

    # Input validation (LineSearchMoreThuente.h:360-366) and descent check
    # (:376-377); the reference throws, we report a status and skip the loop.
    invalid = (step0 <= 0.0) | (step0 < step_min) | (step0 > step_max)
    not_descent = dg0 >= 0.0
    pre_status = jnp.where(
        invalid, jnp.int32(Status.LS_INVALID_STEP),
        jnp.where(not_descent, jnp.int32(Status.LS_NOT_DESCENT),
                  jnp.int32(Status.RUNNING)))
    pre_fail = invalid | not_descent

    fx_init = fx0
    dg_init = dg0
    test_decr = ftol * dg_init          # psi slope (:381)
    test_curv = -wolfe * dg_init        # curvature bound (:383)

    delta_max = jnp.asarray(1.1, dtype)
    delta_min = jnp.asarray(7.0, dtype) / jnp.asarray(12.0, dtype)
    shrink = jnp.asarray(0.66, dtype)

    init = _MTCarry(
        step=step0, fx=fx0, dg=dg0, x=xp, grad=grad0,
        i_lo=jnp.zeros((), dtype), i_hi=inf,
        fi_lo=jnp.zeros((), dtype), fi_hi=inf,
        gi_lo=(1.0 - ftol) * dg_init, gi_hi=inf,
        psi_lo=jnp.zeros((), dtype),
        fx_lo=fx_init, dg_lo=dg_init,
        bracketed=jnp.zeros((), bool), use_smin_sg=step_min > 0.0,
        i_width=inf, i_width_prev=inf,
        shrink_fail=jnp.zeros((), jnp.int32),
        it=jnp.zeros((), jnp.int32), done=pre_fail,
        nfev=jnp.zeros((), jnp.int32),
    )

    max_ls = param.max_linesearch

    def cond(c: _MTCarry):
        return (~c.done) & (c.it < max_ls)

    def body(c: _MTCarry) -> _MTCarry:
        # Trial evaluation (LineSearchMoreThuente.h:412-414)
        x = xp + c.step * drt
        fx, grad = fg(x)
        dg = coll.pdot(grad, drt, axis_name)
        nfev = c.nfev + 1

        psit = fx - fx_init - c.step * test_decr
        dpsit = dg - test_decr

        # Exit tests (:428-447)
        converged = (psit <= 0.0) & (jnp.abs(dg) <= test_curv)
        exit_min = (c.step <= step_min) & ((psit > 0.0) | (dpsit >= 0.0))
        exit_max = (c.step >= step_max) & ((psit <= 0.0) & (dpsit < 0.0))
        done_now = converged | exit_min | exit_max

        # f stays equal to psi throughout (reference keeps f_is_psi == true,
        # :449-461)
        ft = psit
        gt = dpsit

        # step_min safeguard status (:464-471)
        use_sg = c.use_smin_sg & ~((psit <= 0.0) & (dpsit < 0.0))

        # New trial step (:473-514)
        in_case_2 = (psit <= c.psi_lo) & (dpsit * (c.i_lo - c.step) > 0.0)
        step_c2 = jnp.minimum(step_max,
                              c.step + delta_max * (c.step - c.i_lo))
        sel = _step_selection(c.i_lo, c.i_hi, c.step, c.fi_lo, c.fi_hi, ft,
                              c.gi_lo, c.gi_hi, gt, dtype)
        sel = jnp.clip(sel, step_min, step_max)
        sg_upper = jnp.maximum(step_min, delta_min * c.step)
        sel_sg = jnp.minimum(jnp.maximum(sel, step_min), sg_upper)
        step_c13 = jnp.where(use_sg, sel_sg, sel)
        new_step = jnp.where(in_case_2, step_c2, step_c13)

        # 3-case interval update (:516-559), fused with the terminating-
        # trial freeze (the reference `return`s mid-loop keeping the trial
        # in x/fx/dg while the search state stays as-is): each field takes
        # ONE select with a compound predicate instead of the two-layer
        # update-then-freeze, and the trial point x/grad/fx/dg needs no
        # select at all (both paths keep the trial values).
        live = ~done_now
        case1 = psit > c.psi_lo
        case3 = (~case1) & (~in_case_2)
        i_hi = jnp.where(live & case1, c.step,
                         jnp.where(live & case3, c.i_lo, c.i_hi))
        fi_hi = jnp.where(live & case1, ft,
                          jnp.where(live & case3, c.fi_lo, c.fi_hi))
        gi_hi = jnp.where(live & case1, gt,
                          jnp.where(live & case3, c.gi_lo, c.gi_hi))
        take_lo = live & (~case1)
        i_lo = jnp.where(take_lo, c.step, c.i_lo)
        fi_lo = jnp.where(take_lo, ft, c.fi_lo)
        gi_lo = jnp.where(take_lo, gt, c.gi_lo)
        psi_lo = jnp.where(take_lo, psit, c.psi_lo)
        fx_lo = jnp.where(take_lo, fx, c.fx_lo)
        dg_lo = jnp.where(take_lo, dg, c.dg_lo)

        # bracketed status (:561-569)
        i_left = jnp.minimum(i_lo, i_hi)
        i_right = jnp.maximum(i_lo, i_hi)
        bracketed = c.bracketed | (live & (~in_case_2) &
                                   (i_left >= step_min) &
                                   (i_right <= step_max))

        # Forced bisection when the interval fails to shrink (:571-591)
        brk_live = live & bracketed
        i_width_prev = jnp.where(brk_live, c.i_width, c.i_width_prev)
        i_width = jnp.where(brk_live, jnp.abs(i_hi - i_lo), c.i_width)
        fail = (i_width_prev < inf) & (i_width > shrink * i_width_prev)
        shrink_fail = jnp.where(brk_live,
                                jnp.where(fail, c.shrink_fail + 1,
                                          jnp.zeros((), jnp.int32)),
                                c.shrink_fail)
        bisect = brk_live & (shrink_fail >= 2)
        new_step = jnp.where(bisect, (i_lo + i_hi) / 2.0, new_step)
        shrink_fail = jnp.where(bisect, jnp.zeros((), jnp.int32), shrink_fail)

        return _MTCarry(
            step=jnp.where(done_now, c.step, new_step),
            fx=fx, dg=dg, x=x, grad=grad,
            i_lo=i_lo, i_hi=i_hi, fi_lo=fi_lo, fi_hi=fi_hi,
            gi_lo=gi_lo, gi_hi=gi_hi, psi_lo=psi_lo,
            fx_lo=fx_lo, dg_lo=dg_lo,
            bracketed=bracketed,
            use_smin_sg=jnp.where(done_now, c.use_smin_sg, use_sg),
            i_width=i_width, i_width_prev=i_width_prev,
            shrink_fail=shrink_fail,
            it=c.it + 1, done=done_now, nfev=nfev)

    out = lax.while_loop(cond, body, init)

    # Exhausted without termination: return the best-so-far (_lo) state
    # (LineSearchMoreThuente.h:602-614).  The _lo point is reconstructed
    # here instead of carrying x_lo/grad_lo vectors through every trial;
    # fg is pure, so the re-evaluation is bit-identical to the stored
    # values (not counted in nfev, matching the reference count).
    exhausted = (~out.done) & (~pre_fail)
    step = jnp.where(exhausted, out.i_lo, out.step)
    fx = jnp.where(exhausted, out.fx_lo, out.fx)
    dg = jnp.where(exhausted, out.dg_lo, out.dg)

    def _reconstruct_lo(_):
        x_l = xp + out.i_lo * drt
        _, g_l = fg(x_l)
        return x_l, g_l

    x, grad = lax.cond(exhausted, _reconstruct_lo,
                       lambda _: (out.x, out.grad), None)

    # Pre-loop failure keeps the inputs untouched.
    step = jnp.where(pre_fail, step0, step)
    fx = jnp.where(pre_fail, fx0, fx)
    dg = jnp.where(pre_fail, dg0, dg)
    x = jnp.where(pre_fail, xp, x)
    grad = jnp.where(pre_fail, grad0, grad)

    return LineSearchResult(step=step, fx=fx, grad=grad, dg=dg, x=x,
                            status=pre_status, nfev=out.nfev)
