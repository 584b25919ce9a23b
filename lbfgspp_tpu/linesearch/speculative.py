"""Speculative (K-candidate) line search for batched solves.

This search has NO reference counterpart — it is a TPU-native throughput
feature, not a parity path.  Motivation: under ``vmap`` the classic
searches' trial loop runs in lockstep across the batch, so every outer
iteration pays ``max(#trials over the batch)`` sequential body passes
(each a full batched objective evaluation).  The speculative search
instead evaluates a geometric *ladder* of K candidate steps in ONE fused
pass (a length-K leading axis the compiler vectorizes), then picks the
largest acceptable candidate — so almost every line search finishes in a
single round regardless of how many trials the slowest batch instance
would have needed.

Acceptance preference per round, over candidates in descending step
order (all tests use the same ``ftol``/``wolfe`` constants as the
reference searches, LineSearchBacktracking.h:85-106):

1. strong Wolfe  (sufficient decrease + |curvature|),
2. regular Wolfe (sufficient decrease + curvature) — keeps ``s'y`` healthy
   for the curvature gate (LBFGS.h:161),
3. Armijo only,
4. nothing acceptable -> shrink below the smallest candidate and re-ladder.

Costs K objective evaluations per round.  **Measured result on the
headline bench config** (Rosenbrock n=100, batch 4096, m=16, v5e;
``scripts/probe_speculative.py``): SLOWER than Nocedal-Wright — 19.5k
solves/s (k=8) / 17.8k (k=5) vs 23.0k, q@1e-4 0.9976 vs 0.9993 — because
NW averages only ~1.2 evaluations per outer iteration there (lockstep
trial variance across the batch is low), so a K-wide ladder buys ~0.2
saved trials for K-1 extra evaluations.  The search pays only when the
batch's per-iteration trial counts are both high and wide-spread (the
lockstep loop runs max-over-batch trials), e.g. mixed-difficulty problem
sets or ill-scaled objectives; it also needs fewer OUTER iterations than
NW on low-n Rosenbrock (mean 121 vs 137 at n=12).  Kept as a measured,
tested option — not the default anywhere.

Use via ``minimize(..., line_search="speculative")`` or
``make_speculative(k=...)`` for a custom ladder width.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from ..types import LineSearchResult, Status, tree_select

Array = jax.Array


class _SpecCarry(NamedTuple):
    base: Array       # current ladder anchor step
    step: Array       # accepted step
    fx: Array
    dg: Array
    x: Array
    grad: Array
    it: Array         # rounds completed
    done: Array
    status: Array
    nfev: Array


def make_speculative(k: int = 8, dec: float = 0.5, inc: float = 2.0):
    """Build a speculative search with a K-wide candidate ladder.

    The ladder at anchor step ``t`` is ``[inc*t, t, dec*t, dec^2*t, ...]``
    (K entries), clipped to ``[min_step, min(max_step, step_max)]``.
    Matches the unified line-search signature (CHANGELOG v0.3.0 semantics;
    call sites LBFGS.h:127, LBFGSB.h:203).
    """
    if k < 2:
        raise ValueError("speculative line search needs k >= 2")

    def speculative(fg, param, xp: Array, drt: Array, step_max, step0,
                    fx0: Array, grad0: Array, dg0: Array,
                    axis_name: Optional[str] = None) -> LineSearchResult:
        dtype = xp.dtype
        step0 = jnp.asarray(step0, dtype)
        step_max = jnp.asarray(step_max, dtype)
        # Descending ladder factors: [inc, 1, dec, dec^2, ...]
        ladder = jnp.asarray(
            [inc] + [dec ** j for j in range(k - 1)], dtype)

        invalid = step0 <= 0.0
        # The driver passes dg0 = g.d freshly computed (unified signature);
        # unlike the parity searches (which mirror the reference's
        # recompute, LineSearchBacktracking.h:60) this non-parity search
        # reuses it — one fewer [n] reduction (and collective) per call.
        dg_init = dg0
        not_descent = dg_init > 0.0
        pre_fail = invalid | not_descent
        pre_status = jnp.where(
            invalid, jnp.int32(Status.LS_INVALID_STEP),
            jnp.where(not_descent, jnp.int32(Status.LS_NOT_DESCENT),
                      jnp.int32(Status.RUNNING)))

        ftol = jnp.asarray(param.ftol, dtype)
        wolfe = jnp.asarray(param.wolfe, dtype)
        test_decr = ftol * dg_init
        hi = jnp.minimum(jnp.asarray(param.max_step, dtype), step_max)
        lo = jnp.asarray(param.min_step, dtype)
        max_rounds = max(1, -(-param.max_linesearch // k))  # ceil div

        init = _SpecCarry(base=step0, step=step0, fx=fx0, dg=dg0, x=xp,
                          grad=grad0, it=jnp.zeros((), jnp.int32),
                          done=pre_fail, status=pre_status,
                          nfev=jnp.zeros((), jnp.int32))

        def cond(c: _SpecCarry):
            running = c.status == jnp.int32(Status.RUNNING)
            return (~c.done) & running & (c.it < max_rounds)

        def body(c: _SpecCarry) -> _SpecCarry:
            steps = jnp.clip(c.base * ladder, lo, hi)
            xs = xp[None, :] + steps[:, None] * drt[None, :]
            fxs, grads = jax.vmap(fg)(xs)
            # Per-candidate directional derivatives; vmapped jnp.dot keeps
            # the per-row reduction order identical to the classic
            # searches' coll.pdot (bit-stable under vmap), and the psum is
            # still one fused [K] collective when sharded.
            dgs = coll.psum_scalar(
                jax.vmap(lambda g: jnp.dot(g, drt,
                                           precision=lax.Precision.HIGHEST))
                (grads), axis_name)
            nfev = c.nfev + k

            in_range = (c.base * ladder >= lo) & (c.base * ladder <= hi)
            armijo = (fxs <= fx0 + steps * test_decr) & \
                jnp.isfinite(fxs) & in_range
            curv = dgs >= wolfe * dg_init
            strong = curv & (dgs <= -wolfe * dg_init)

            m_strong = armijo & strong
            m_wolfe = armijo & curv
            mask = jnp.where(m_strong.any(), m_strong,
                             jnp.where(m_wolfe.any(), m_wolfe, armijo))
            has = mask.any()
            idx = jnp.argmax(mask)   # first True = largest acceptable step

            # Anchor the next round below the smallest candidate tried.
            next_base = c.base * ladder[-1] * jnp.asarray(dec, dtype)
            too_small = next_base < lo
            status = jnp.where(
                has, c.status,
                jnp.where(too_small, jnp.int32(Status.LS_STEP_TOO_SMALL),
                          c.status))

            accept = _SpecCarry(
                base=c.base, step=steps[idx], fx=fxs[idx], dg=dgs[idx],
                x=xs[idx], grad=grads[idx], it=c.it + 1,
                done=jnp.ones((), bool), status=c.status, nfev=nfev)
            retry = _SpecCarry(
                base=next_base, step=c.step, fx=c.fx, dg=c.dg, x=c.x,
                grad=c.grad, it=c.it + 1, done=jnp.zeros((), bool),
                status=status, nfev=nfev)
            return tree_select(has, accept, retry)

        out = lax.while_loop(cond, body, init)

        exhausted = (~out.done) & (out.status == jnp.int32(Status.RUNNING))
        status = jnp.where(exhausted, jnp.int32(Status.LS_MAX_LINESEARCH),
                           out.status)
        return LineSearchResult(step=out.step, fx=out.fx, grad=out.grad,
                                dg=out.dg, x=out.x, status=status,
                                nfev=out.nfev)

    return speculative


speculative = make_speculative()
