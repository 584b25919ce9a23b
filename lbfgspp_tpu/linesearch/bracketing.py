"""Bracketing line search.

TPU re-expression of /root/reference/include/LBFGSpp/LineSearchBracketing.h
(backtracking variant that maintains an explicit [step_lo, step_hi] range:
doubling while the upper end is infinite, bisection once bounded, reference
:123).  Throw sites (:113-127) map to failure statuses.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from ..params import (LINESEARCH_BACKTRACKING_ARMIJO,
                      LINESEARCH_BACKTRACKING_WOLFE)
from ..types import LineSearchResult, Status, tree_select

Array = jax.Array


class _BRCarry(NamedTuple):
    step: Array
    fx: Array
    dg: Array
    x: Array
    grad: Array
    step_lo: Array
    step_hi: Array
    it: Array
    done: Array
    status: Array
    nfev: Array


def bracketing(fg, param, xp: Array, drt: Array, step_max, step0,
               fx0: Array, grad0: Array, dg0: Array,
               axis_name: Optional[str] = None) -> LineSearchResult:
    """Bracketing search; ``step_max`` is ignored (L-BFGS only)."""
    del step_max
    dtype = xp.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    step0 = jnp.asarray(step0, dtype)

    invalid = step0 <= 0.0
    dg_init = coll.pdot(grad0, drt, axis_name)   # recomputed as in :60
    not_descent = dg_init > 0.0
    pre_fail = invalid | not_descent
    pre_status = jnp.where(
        invalid, jnp.int32(Status.LS_INVALID_STEP),
        jnp.where(not_descent, jnp.int32(Status.LS_NOT_DESCENT),
                  jnp.int32(Status.RUNNING)))

    fx_init = fx0
    test_decr = jnp.asarray(param.ftol, dtype) * dg_init
    wolfe = jnp.asarray(param.wolfe, dtype)
    max_ls = param.max_linesearch
    armijo_only = param.linesearch == LINESEARCH_BACKTRACKING_ARMIJO
    regular_wolfe = param.linesearch == LINESEARCH_BACKTRACKING_WOLFE

    init = _BRCarry(step=step0, fx=fx0, dg=dg0, x=xp, grad=grad0,
                    step_lo=jnp.zeros((), dtype), step_hi=inf,
                    it=jnp.zeros((), jnp.int32), done=pre_fail,
                    status=pre_status, nfev=jnp.zeros((), jnp.int32))

    def cond(c: _BRCarry):
        running = c.status == jnp.int32(Status.RUNNING)
        return (~c.done) & running & (c.it < max_ls)

    def body(c: _BRCarry) -> _BRCarry:
        x = xp + c.step * drt
        fx, grad = fg(x)
        nfev = c.nfev + 1

        decr_fail = (fx > fx_init + c.step * test_decr) | \
            (~jnp.isfinite(fx))
        dg = jnp.where(decr_fail, c.dg, coll.pdot(grad, drt, axis_name))

        # Range / condition update (reference :79-111)
        if armijo_only:
            met = ~decr_fail
            hi_to_step = decr_fail
            lo_to_step = jnp.zeros((), bool)
        else:
            curv_low = dg < wolfe * dg_init
            if regular_wolfe:
                met = (~decr_fail) & (~curv_low)
                hi_to_step = decr_fail
                lo_to_step = (~decr_fail) & curv_low
            else:  # strong Wolfe
                strong_fail = dg > -wolfe * dg_init
                met = (~decr_fail) & (~curv_low) & (~strong_fail)
                hi_to_step = decr_fail | ((~decr_fail) & (~curv_low) &
                                          strong_fail)
                lo_to_step = (~decr_fail) & curv_low

        step_hi = jnp.where(hi_to_step, c.step, c.step_hi)
        step_lo = jnp.where(lo_to_step, c.step, c.step_lo)

        # Failure checks after the update (reference :113-120)
        inverted = step_lo > step_hi
        too_small = c.step < param.min_step
        too_large = c.step > param.max_step
        status = jnp.where(
            met, c.status,
            jnp.where(inverted, jnp.int32(Status.LS_BRACKET_INVERTED),
                      jnp.where(too_small,
                                jnp.int32(Status.LS_STEP_TOO_SMALL),
                                jnp.where(too_large,
                                          jnp.int32(Status.LS_STEP_TOO_LARGE),
                                          c.status))))

        # Next trial: double while unbounded, else bisect (reference :123)
        new_step = jnp.where(jnp.isinf(step_hi), 2.0 * c.step,
                             step_lo / 2.0 + step_hi / 2.0)

        new = _BRCarry(step=new_step, fx=fx, dg=dg, x=x, grad=grad,
                       step_lo=step_lo, step_hi=step_hi, it=c.it + 1,
                       done=jnp.zeros((), bool), status=status, nfev=nfev)
        stop = _BRCarry(step=c.step, fx=fx, dg=dg, x=x, grad=grad,
                        step_lo=c.step_lo, step_hi=c.step_hi, it=c.it + 1,
                        done=jnp.ones((), bool), status=c.status, nfev=nfev)
        return tree_select(met, stop, new)

    out = lax.while_loop(cond, body, init)

    exhausted = (~out.done) & (out.status == jnp.int32(Status.RUNNING))
    status = jnp.where(exhausted, jnp.int32(Status.LS_MAX_LINESEARCH),
                       out.status)
    return LineSearchResult(step=out.step, fx=out.fx, grad=out.grad,
                            dg=out.dg, x=out.x, status=status, nfev=out.nfev)
