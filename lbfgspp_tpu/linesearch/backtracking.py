"""Backtracking line search (Armijo / Wolfe / strong Wolfe).

TPU re-expression of /root/reference/include/LBFGSpp/LineSearchBacktracking.h:
multiplicative step scaling (dec=0.5, inc=2.1, reference :50-51) until the
condition selected by ``param.linesearch`` holds (:85-106), NaN objective
forcing a decrease (:76).  The reference *throws* on min/max-step violations
and on exhausting ``max_linesearch`` (:110-120); those become failure statuses
that abort the solver loop.
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


class _BTCarry(NamedTuple):
    step: Array
    fx: Array
    dg: Array
    x: Array
    grad: Array
    it: Array
    done: Array      # met the termination condition (success)
    status: Array
    nfev: Array


def backtracking(fg, param, xp: Array, drt: Array, step_max, step0,
                 fx0: Array, grad0: Array, dg0: Array,
                 axis_name: Optional[str] = None) -> LineSearchResult:
    """Backtracking search; ``step_max`` is ignored (L-BFGS only,
    reference :32-33)."""
    del step_max
    dtype = xp.dtype
    dec = jnp.asarray(0.5, dtype)
    inc = jnp.asarray(2.1, dtype)
    step0 = jnp.asarray(step0, dtype)

    invalid = step0 <= 0.0
    # The reference recomputes dg_init from the inputs (:60).
    dg_init = coll.pdot(grad0, drt, axis_name)
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

    init = _BTCarry(step=step0, fx=fx0, dg=dg0, x=xp, grad=grad0,
                    it=jnp.zeros((), jnp.int32),
                    done=pre_fail, status=pre_status,
                    nfev=jnp.zeros((), jnp.int32))

    def cond(c: _BTCarry):
        running = c.status == jnp.int32(Status.RUNNING)
        return (~c.done) & running & (c.it < max_ls)

    def body(c: _BTCarry) -> _BTCarry:
        x = xp + c.step * drt
        fx, grad = fg(x)
        nfev = c.nfev + 1

        decr_fail = (fx > fx_init + c.step * test_decr) | jnp.isnan(fx)
        dg = jnp.where(decr_fail, c.dg, coll.pdot(grad, drt, axis_name))

        # Condition cascade (reference :76-107)
        if armijo_only:
            met = ~decr_fail
            width = jnp.where(decr_fail, dec, dec)  # unused when met
        else:
            curv_low = dg < wolfe * dg_init
            if regular_wolfe:
                met = (~decr_fail) & (~curv_low)
                width = jnp.where(decr_fail | (~curv_low), dec, inc)
            else:  # strong Wolfe
                strong_fail = dg > -wolfe * dg_init
                met = (~decr_fail) & (~curv_low) & (~strong_fail)
                width = jnp.where(decr_fail, dec,
                                  jnp.where(curv_low, inc, dec))

        # Step-range failures checked before scaling (reference :110-115)
        too_small = c.step < param.min_step
        too_large = c.step > param.max_step
        status = jnp.where(
            met, c.status,
            jnp.where(too_small, jnp.int32(Status.LS_STEP_TOO_SMALL),
                      jnp.where(too_large, jnp.int32(Status.LS_STEP_TOO_LARGE),
                                c.status)))

        new = _BTCarry(step=c.step * width, fx=fx, dg=dg, x=x, grad=grad,
                       it=c.it + 1, done=jnp.zeros((), bool), status=status,
                       nfev=nfev)
        stop = _BTCarry(step=c.step, fx=fx, dg=dg, x=x, grad=grad,
                        it=c.it + 1, done=jnp.ones((), bool), status=c.status,
                        nfev=nfev)
        return tree_select(met, stop, new)

    out = lax.while_loop(cond, body, init)

    exhausted = (~out.done) & (out.status == jnp.int32(Status.RUNNING))
    status = jnp.where(exhausted, jnp.int32(Status.LS_MAX_LINESEARCH),
                       out.status)
    return LineSearchResult(step=out.step, fx=out.fx, grad=out.grad,
                            dg=out.dg, x=out.x, status=status, nfev=out.nfev)
