"""Nocedal-Wright strong-Wolfe line search.

TPU re-expression of /root/reference/include/LBFGSpp/LineSearchNocedalWright.h
("Numerical Optimization" Algorithms 3.5/3.6): an expansion-factor-2
bracketing phase (reference :130-198) followed by a zoom phase with
safeguarded quadratic interpolation (:200-278, ``quad_interp`` :30-60 falling
back to bisection near the ends / on NaN / outside the interval).  Returns the
best-so-far point instead of throwing when iterations run out (:185-194,
:263-277); the genuine numerical-failure throws (:227, :247, :267) become
``LS_NUMERICAL``.  This is the default search for the L-BFGS solver
(LBFGS.h:21).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from ..params import LINESEARCH_BACKTRACKING_STRONG_WOLFE
from ..types import LineSearchResult, Status

Array = jax.Array


def _quad_interp(step_lo, step_hi, fx_lo, fx_hi, dg_lo):
    """Safeguarded quadratic interpolation (reference :30-60)."""
    fdiff = fx_hi - fx_lo
    sdiff = step_hi - step_lo
    smid = (step_hi + step_lo) / 2.0
    step_candid = (fdiff * step_lo - smid * sdiff * dg_lo) / \
        (fdiff - sdiff * dg_lo)

    candid_nan = ~jnp.isfinite(step_candid)
    end_dist = jnp.minimum(jnp.abs(step_candid - step_lo),
                           jnp.abs(step_candid - step_hi))
    near_end = end_dist < 0.01 * jnp.abs(sdiff)
    bisect = candid_nan | \
        (step_candid <= jnp.minimum(step_lo, step_hi)) | \
        (step_candid >= jnp.maximum(step_lo, step_hi)) | near_end
    return jnp.where(bisect, smid, step_candid)


class _NWCarry(NamedTuple):
    step: Array
    fx: Array
    dg: Array
    x: Array
    grad: Array
    step_lo: Array
    fx_lo: Array
    dg_lo: Array
    step_hi: Array
    fx_hi: Array
    it: Array
    phase: Array    # 0 = bracketing, 1 = zoom, 2 = finished
    status: Array
    use_lo: Array   # finish by returning the _lo state
    nfev: Array


def nocedalwright(fg, param, xp: Array, drt: Array, step_max, step0,
                  fx0: Array, grad0: Array, dg0: Array,
                  axis_name: Optional[str] = None) -> LineSearchResult:
    """Nocedal-Wright search; ``step_max`` is ignored (L-BFGS only)."""
    del step_max
    if param.linesearch != LINESEARCH_BACKTRACKING_STRONG_WOLFE:
        # Reference :95-96 (param is static, so this check is eager).
        raise ValueError(
            "'param.linesearch' must be LINESEARCH_BACKTRACKING_STRONG_WOLFE"
            " for the Nocedal-Wright line search")

    dtype = xp.dtype
    step0 = jnp.asarray(step0, dtype)

    invalid = step0 <= 0.0
    dg_init = dg0                       # uses the caller-supplied dg (:114)
    not_descent = dg_init > 0.0
    pre_fail = invalid | not_descent
    pre_status = jnp.where(
        invalid, jnp.int32(Status.LS_INVALID_STEP),
        jnp.where(not_descent, jnp.int32(Status.LS_NOT_DESCENT),
                  jnp.int32(Status.RUNNING)))

    fx_init = fx0
    test_decr = jnp.asarray(param.ftol, dtype) * dg_init
    test_curv = -jnp.asarray(param.wolfe, dtype) * dg_init
    expansion = jnp.asarray(2.0, dtype)
    max_ls = param.max_linesearch

    init = _NWCarry(
        step=step0, fx=fx0, dg=dg0, x=xp, grad=grad0,
        step_lo=jnp.zeros((), dtype), fx_lo=fx_init, dg_lo=dg_init,
        step_hi=jnp.zeros((), dtype), fx_hi=jnp.zeros((), dtype),
        it=jnp.zeros((), jnp.int32),
        phase=jnp.where(pre_fail, jnp.int32(2), jnp.int32(0)),
        status=pre_status, use_lo=jnp.zeros((), bool),
        nfev=jnp.zeros((), jnp.int32))

    def cond(c: _NWCarry):
        return c.phase != 2

    def _bracket_body(c: _NWCarry) -> _NWCarry:
        """One iteration of the bracketing phase (reference :143-198)."""
        x = xp + c.step * drt
        fx, grad = fg(x)
        dg = coll.pdot(grad, drt, axis_name)
        nfev = c.nfev + 1

        # Case (1)/(2): sufficient decrease violated -> bracketed, go zoom
        to_zoom_hi = (fx - fx_init > c.step * test_decr) | \
            ((c.step_lo > 0.0) & (fx >= c.fx_lo))
        # Case (4): strong Wolfe met -> finished with the trial point
        wolfe_met = (~to_zoom_hi) & (jnp.abs(dg) <= test_curv)
        # Otherwise shift lo to the trial
        shift = (~to_zoom_hi) & (~wolfe_met)
        # Case (3): dg >= 0 -> bracketed with [step, old lo], go zoom
        to_zoom_flip = shift & (dg >= 0.0)
        keep_going = shift & (dg < 0.0)
        it = c.it + jnp.where(keep_going, jnp.int32(1), jnp.int32(0))
        exhausted = keep_going & (it >= max_ls)

        step_hi = jnp.where(to_zoom_hi, c.step,
                            jnp.where(shift, c.step_lo, c.step_hi))
        fx_hi = jnp.where(to_zoom_hi, fx,
                          jnp.where(shift, c.fx_lo, c.fx_hi))
        step_lo = jnp.where(shift, c.step, c.step_lo)
        fx_lo = jnp.where(shift, fx, c.fx_lo)
        dg_lo = jnp.where(shift, dg, c.dg_lo)

        finished = wolfe_met | exhausted
        phase = jnp.where(finished, jnp.int32(2),
                          jnp.where(to_zoom_hi | to_zoom_flip, jnp.int32(1),
                                    jnp.int32(0)))
        new_step = jnp.where(keep_going & (~exhausted),
                             c.step * expansion, c.step)
        # On exhaustion the trial just became _lo, so the current values are
        # already the best-so-far (reference :185-194).
        return _NWCarry(step=new_step, fx=fx, dg=dg, x=x, grad=grad,
                        step_lo=step_lo, fx_lo=fx_lo, dg_lo=dg_lo,
                        step_hi=step_hi, fx_hi=fx_hi, it=it, phase=phase,
                        status=c.status, use_lo=jnp.zeros((), bool),
                        nfev=nfev)

    def _zoom_body(c: _NWCarry) -> _NWCarry:
        """One iteration of the zoom phase (reference :211-278)."""
        step = _quad_interp(c.step_lo, c.step_hi, c.fx_lo, c.fx_hi, c.dg_lo)
        x = xp + step * drt
        fx, grad = fg(x)
        dg = coll.pdot(grad, drt, axis_name)
        nfev = c.nfev + 1

        decr_fail = (fx - fx_init > step * test_decr) | (fx >= c.fx_lo)
        # Branch A: shrink from above (reference :224-232)
        fail_hi = decr_fail & (step == c.step_hi)
        # Branch B: sufficient decrease holds (reference :233-256)
        wolfe_met = (~decr_fail) & (jnp.abs(dg) <= test_curv)
        flip = (~decr_fail) & (~wolfe_met) & \
            (dg * (c.step_hi - c.step_lo) >= 0.0)
        fail_lo = (~decr_fail) & (~wolfe_met) & (step == c.step_lo)

        step_hi = jnp.where(decr_fail, step,
                            jnp.where(flip, c.step_lo, c.step_hi))
        fx_hi = jnp.where(decr_fail, fx, jnp.where(flip, c.fx_lo, c.fx_hi))

        take_lo = (~decr_fail) & (~wolfe_met) & (~fail_lo)
        step_lo = jnp.where(take_lo, step, c.step_lo)
        fx_lo = jnp.where(take_lo, fx, c.fx_lo)
        dg_lo = jnp.where(take_lo, dg, c.dg_lo)

        it = c.it + 1
        numerical_fail = fail_hi | fail_lo
        exhausted = (~numerical_fail) & (~wolfe_met) & (it >= max_ls)
        # Exhaustion with no sufficient-decrease point found is a failure
        # (reference :266-267); otherwise return the _lo state.
        exhaust_fail = exhausted & (step_lo <= 0.0)
        use_lo = exhausted & (~exhaust_fail)

        status = jnp.where(numerical_fail | exhaust_fail,
                           jnp.int32(Status.LS_NUMERICAL), c.status)
        finished = wolfe_met | numerical_fail | exhausted
        phase = jnp.where(finished, jnp.int32(2), jnp.int32(1))

        return _NWCarry(step=step, fx=fx, dg=dg, x=x, grad=grad,
                        step_lo=step_lo, fx_lo=fx_lo, dg_lo=dg_lo,
                        step_hi=step_hi, fx_hi=fx_hi, it=it, phase=phase,
                        status=status, use_lo=use_lo, nfev=nfev)

    def body(c: _NWCarry) -> _NWCarry:
        # lax.cond runs only the active phase per iteration (one objective
        # evaluation); under vmap it degrades to a select as usual.
        return lax.cond(c.phase == 0, _bracket_body, _zoom_body, c)

    out = lax.while_loop(cond, body, init)

    step = jnp.where(out.use_lo, out.step_lo, out.step)
    fx = jnp.where(out.use_lo, out.fx_lo, out.fx)
    dg = jnp.where(out.use_lo, out.dg_lo, out.dg)

    # The best-so-far (_lo) point is reconstructed only on the rare
    # exhaustion exit instead of carrying x_lo/grad_lo vectors through
    # every trial; fg is pure, so the re-evaluation is bit-identical to
    # the stored values (and not counted in nfev, matching the reference's
    # evaluation count).
    def _reconstruct_lo(_):
        x_l = xp + out.step_lo * drt
        _, g_l = fg(x_l)
        return x_l, g_l

    x, grad = lax.cond(out.use_lo, _reconstruct_lo,
                       lambda _: (out.x, out.grad), None)

    step = jnp.where(pre_fail, step0, step)
    fx = jnp.where(pre_fail, fx0, fx)
    dg = jnp.where(pre_fail, dg0, dg)
    x = jnp.where(pre_fail, xp, x)
    grad = jnp.where(pre_fail, grad0, grad)

    return LineSearchResult(step=step, fx=fx, grad=grad, dg=dg, x=x,
                            status=out.status, nfev=out.nfev)
