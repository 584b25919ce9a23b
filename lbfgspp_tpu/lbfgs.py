"""Unconstrained L-BFGS solver.

TPU-native re-design of the reference driver
(/root/reference/include/LBFGS.h): the whole ``minimize`` loop
(LBFGS.h:79-173) is one ``lax.while_loop`` over an explicit state pytree, so a
solve is a single traced XLA computation — jittable, ``vmap``-pable over a
batch of problems, and shardable over the feature axis (pass ``axis_name``
under ``shard_map``).

Algorithmic invariants preserved from the reference:

* first direction ``d = -g`` with initial step ``1/||d||`` (LBFGS.h:106-108),
  step reset to 1 after every iteration (LBFGS.h:168);
* curvature-gated history update ``s'y > eps_machine * y'y`` (LBFGS.h:161);
* convergence when ``||g|| <= max(epsilon, epsilon_rel * ||x||)``
  (LBFGS.h:100, :137) plus the optional past/delta objective test over a
  circular buffer (LBFGS.h:142-149); ``max_iterations == 0`` means unlimited.

Beyond the reference's run-to-completion ``minimize``, the solver is also
exposed as an explicit ``init / step / finalize`` triple (:func:`solver`):
the full state is one pytree, so checkpointing a long solve is serializing
the carry, resuming is passing it back, and driving N steps at a time from
the host needs no framework support (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .ops import history as hist_ops
from .linesearch import get_line_search
from .parallel import collectives as coll
from .params import LBFGSParams
from .types import (SolveResult, Status, make_fun_and_grad, freeze_when)

Array = jax.Array


class LBFGSState(NamedTuple):
    """Full solver state — the ``lax.while_loop`` carry.

    The reference keeps this as mutable members of ``LBFGSSolver``
    (LBFGS.h:31-38); here it is an explicit pytree: serialize it to
    checkpoint, restore it to resume.
    """

    k: Array
    x: Array
    fx: Array
    grad: Array
    gnorm: Array
    drt: Array
    step: Array
    hist: hist_ops.LBFGSHistory
    fx_ring: Array
    done: Array
    status: Array
    nfev: Array


# Backwards-compatible private alias
_Carry = LBFGSState


class Solver(NamedTuple):
    """An ``init / step / finalize`` view of a solver (SURVEY.md §5).

    ``init(x0) -> state``; ``step(state) -> state`` runs ONE outer iteration
    (no-op once ``state.done``); ``finalize(state) -> SolveResult``;
    ``run(state) -> state`` iterates to termination inside one
    ``lax.while_loop``.  ``run_fixed(state, iters)`` runs exactly ``iters``
    frozen-masked steps in a ``lax.fori_loop`` — bit-identical to ``run``
    whenever ``iters`` covers the instance's termination point (finished
    instances freeze, see :func:`~.types.freeze_when`), but with a static
    trip count, which lowers to a cheaper loop than the data-dependent
    ``while_loop`` cond (no per-iteration all-done reduction; material for
    capped lockstep batches).  All are pure and jittable; ``state`` is an
    :class:`LBFGSState` (or the L-BFGS-B equivalent) pytree.
    """

    init: Callable
    step: Callable
    finalize: Callable
    run: Callable
    run_fixed: Callable


def solver(fun: Optional[Callable] = None,
           params: LBFGSParams = LBFGSParams(),
           *,
           fun_and_grad=None,
           line_search="nocedalwright",
           axis_name: Optional[str] = None,
           history_dtype=None,
           direction: str = "sweeps",
           on_ls_fail: str = "stop") -> Solver:
    """Build the L-BFGS ``init/step/finalize`` triple.

    ``minimize`` is ``finalize(run(init(x0)))``; checkpointed runs call
    ``step`` (or ``run`` with a bounded ``max_iterations``) and snapshot the
    state pytree between calls.

    ``history_dtype`` (e.g. ``jnp.bfloat16``) stores the (s, y) correction
    rows at reduced precision while all reductions accumulate in the solve
    dtype — halves the HBM traffic of the per-iteration history streams at
    a small accuracy cost (a quantized-curvature approximation; the exact
    pairs' inner products are still used for the gate, theta and Grams).

    ``direction`` selects the two-loop triangular-solve schedule
    (:func:`..ops.history.apply_hv`): ``"sweeps"`` (default) is the
    bit-parity path; ``"rinv"`` maintains the compact-form ``R^{-1}``
    incrementally and applies it with three [m, m] matvecs — the same
    direction up to reassociation rounding, measurably faster for batched
    throughput mode (PERF.md).

    ``on_ls_fail`` selects what a line-search FAILURE does.  ``"stop"``
    (default) terminates the instance with the failure's Status code —
    the reference's semantics (its searches throw,
    LineSearchNocedalWright.h:263-267; the throw becomes a status).
    ``"restart"`` is a greenfield robustification for budgeted batch
    phases: the failed trial is kept only if it is finite and does not
    increase f (else the pre-search iterate is restored), the curvature
    history is RESET, and the instance continues from steepest descent
    with the remaining iteration budget — a failed search no longer
    idles the instance for the rest of a fixed-budget phase or leaves a
    poisoned history to the polish stages.  Requires a finite
    ``params.max_iterations`` (a permanently-failing instance would
    otherwise loop forever).

    .. warning:: ``direction="rinv"`` with LARGE histories degrades f32
       solution quality: the R^{-1} maintenance conditions like the Gram
       matrix, and at m=24 the measured batched-Rosenbrock acceptance
       drops to 0.966 (m=32: 0.45) at matched budgets (PERF.md round-3
       frontier).  m <= 16 is the measured-safe regime in f32; a
       ``UserWarning`` fires above it.
    """
    if on_ls_fail not in ("stop", "restart"):
        raise ValueError(f"on_ls_fail must be 'stop' or 'restart', "
                         f"got {on_ls_fail!r}")
    if on_ls_fail == "restart" and params.max_iterations == 0:
        raise ValueError("on_ls_fail='restart' requires a finite "
                         "params.max_iterations (a permanently-failing "
                         "instance would loop forever)")
    if direction == "rinv" and params.m > 16:
        import warnings
        warnings.warn(
            f"direction='rinv' with m={params.m} > 16 is outside the "
            f"measured-safe f32 regime and has a measured "
            f"solution-quality cliff at larger m (batched acceptance "
            f"0.966 at m=24, 0.45 at m=32 — PERF.md round-3 frontier); "
            f"use m <= 16 in f32, or direction='sweeps' for large "
            f"histories",
            UserWarning, stacklevel=2)
    fg = make_fun_and_grad(fun, fun_and_grad)
    search = get_line_search(line_search)
    fpast = params.past

    def init(x0: Array, fg0=None) -> LBFGSState:
        """``fg0``: optional precomputed ``(fx0, grad0)`` at ``x0`` — skips
        evaluation #0 (LBFGS.h:91) when the caller already holds it (e.g.
        the optax interop, where the training loop owns value/grad)."""
        x0 = jnp.asarray(x0)
        dtype = x0.dtype
        n = x0.shape[0]

        fx0, grad0 = fg(x0) if fg0 is None else fg0
        gnorm0 = coll.pnorm(grad0, axis_name)
        ring_len = max(fpast, 1)
        fx_ring = jnp.zeros((ring_len,), dtype)
        if fpast > 0:
            fx_ring = fx_ring.at[0].set(fx0)

        # Early exit if x0 is already a minimizer (LBFGS.h:100-103).
        early = (gnorm0 <= params.epsilon) | \
            (gnorm0 <= params.epsilon_rel * coll.pnorm(x0, axis_name))

        drt0 = -grad0
        step0 = 1.0 / coll.pnorm(drt0, axis_name)

        hist0 = hist_ops.init_history(n, params.m, dtype,
                                      store_dtype=history_dtype,
                                      with_rinv=direction == "rinv")
        if axis_name is not None:
            # Mark the shard-local history matrices as device-varying for
            # shard_map's type system (their zeros initializer is invariant
            # but the loop body writes shard-local s/y rows into them).
            hist0 = hist0._replace(s=coll.pvary(hist0.s, axis_name),
                                   y=coll.pvary(hist0.y, axis_name))

        return LBFGSState(
            k=jnp.ones((), jnp.int32),
            x=x0, fx=fx0, grad=grad0, gnorm=gnorm0, drt=drt0, step=step0,
            hist=hist0,
            fx_ring=fx_ring,
            done=early,
            status=jnp.where(early, jnp.int32(Status.CONVERGED_GRAD),
                             jnp.int32(Status.RUNNING)),
            nfev=jnp.ones((), jnp.int32))

    def body(c: LBFGSState) -> LBFGSState:
        dtype = c.x.dtype
        xp, gradp = c.x, c.grad
        dg = coll.pdot(c.grad, c.drt, axis_name)

        ls = search(fg, params, xp, c.drt, params.max_step, c.step, c.fx,
                    c.grad, dg, axis_name=axis_name)
        nfev = c.nfev + ls.nfev

        ls_fail = ls.status != jnp.int32(Status.RUNNING)

        if on_ls_fail == "restart":
            # Keep the failed search's point only if it is finite and no
            # worse; otherwise restore the pre-search iterate.  The
            # instance does NOT stop on failure (see solver docstring).
            accept = (~ls_fail) | (jnp.isfinite(ls.fx) & (ls.fx <= c.fx))
            x_new = jnp.where(accept, ls.x, xp)
            fx_new = jnp.where(accept, ls.fx, c.fx)
            grad_new = jnp.where(accept, ls.grad, gradp)
        else:
            x_new, fx_new, grad_new = ls.x, ls.fx, ls.grad
        gnorm = coll.pnorm(grad_new, axis_name)

        # Convergence test: gradient (LBFGS.h:137-140)
        conv_grad = (gnorm <= params.epsilon) | \
            (gnorm <= params.epsilon_rel * coll.pnorm(x_new, axis_name))

        # Convergence test: objective decrease (LBFGS.h:142-149)
        if fpast > 0:
            fxd = c.fx_ring[c.k % fpast]
            conv_past = (c.k >= fpast) & \
                (jnp.abs(fxd - fx_new) <= params.delta *
                 jnp.maximum(jnp.maximum(jnp.abs(fx_new), jnp.abs(fxd)),
                             1.0))
            fx_ring = c.fx_ring.at[c.k % fpast].set(fx_new)
        else:
            conv_past = jnp.zeros((), bool)
            fx_ring = c.fx_ring

        # Iteration cap (LBFGS.h:151-154)
        max_iter = (params.max_iterations != 0) & \
            (c.k >= params.max_iterations)

        if on_ls_fail == "restart":
            # A failed-search iteration made no (or restored) progress, so
            # the past/delta test would compare two near-identical fx
            # values and fire spuriously — a permanently-failing instance
            # would then terminate CONVERGED_DELTA, a success status
            # masking the persistent failure.  Suppress the test on
            # failed iterations; such an instance now correctly reports
            # MAX_ITERATIONS.  (The default "stop" path and past=0 are
            # bit-unchanged.)
            conv_past = conv_past & ~ls_fail
            done = conv_grad | conv_past | max_iter
            status = jnp.where(
                conv_grad, jnp.int32(Status.CONVERGED_GRAD),
                jnp.where(conv_past, jnp.int32(Status.CONVERGED_DELTA),
                          jnp.where(max_iter,
                                    jnp.int32(Status.MAX_ITERATIONS),
                                    jnp.int32(Status.RUNNING))))
        else:
            done = ls_fail | conv_grad | conv_past | max_iter
            status = jnp.where(
                ls_fail, ls.status,
                jnp.where(conv_grad, jnp.int32(Status.CONVERGED_GRAD),
                          jnp.where(conv_past,
                                    jnp.int32(Status.CONVERGED_DELTA),
                                    jnp.where(max_iter,
                                              jnp.int32(
                                                  Status.MAX_ITERATIONS),
                                              jnp.int32(Status.RUNNING)))))

        # History update with curvature gate (LBFGS.h:159-162); gate and
        # ring-buffer/Gram writes share one fused product (one collective).
        s = x_new - xp
        y = grad_new - gradp
        hist, _ = hist_ops.update_history(c.hist, s, y, ~done & ~ls_fail,
                                          axis_name)
        if on_ls_fail == "restart":
            # A failed search resets the curvature model: continue from
            # steepest descent with first-iteration step 1/||g||
            # (LBFGS.h:106-108 semantics for the restarted instance).
            # SOFT reset — only the scalar validity state: every read of
            # the s/y rows, ys, Grams and rinv is masked by the ring
            # distance-vs-ncorr validity test (ops/history.py), so
            # ``ncorr = 0`` (+ ``theta = 1``) makes the stale slot data
            # unreachable without touching the [2m, n] arrays (a full
            # tree_select reset measured ~20% of headline throughput).
            hist = hist._replace(
                ncorr=jnp.where(ls_fail, jnp.int32(0), hist.ncorr),
                theta=jnp.where(ls_fail, jnp.ones((), hist.theta.dtype),
                                hist.theta))

        # New direction d = -H g (LBFGS.h:165) and step reset (LBFGS.h:168)
        drt = hist_ops.apply_hv(hist, grad_new, -1.0, axis_name,
                                tri=direction)
        step_new = jnp.ones((), dtype)
        if on_ls_fail == "restart":
            gsafe = jnp.where(gnorm > 0.0, gnorm, 1.0)
            step_new = jnp.where(ls_fail, 1.0 / gsafe, step_new)

        return LBFGSState(
            k=jnp.where(done, c.k, c.k + 1),
            x=x_new, fx=fx_new, grad=grad_new, gnorm=gnorm, drt=drt,
            step=step_new, hist=hist, fx_ring=fx_ring,
            done=done, status=status, nfev=nfev)

    def step(c: LBFGSState) -> LBFGSState:
        # Freeze finished instances so vmap-ing a whole solve is exact and
        # a step on a done state is a no-op.
        return freeze_when(c.done, c, body)

    def run(c: LBFGSState) -> LBFGSState:
        return lax.while_loop(lambda s: ~s.done, step, c)

    def run_fixed(c: LBFGSState, iters: int) -> LBFGSState:
        return lax.fori_loop(0, iters, lambda _, s: step(s), c,
                             unroll=False)

    def finalize(c: LBFGSState) -> SolveResult:
        return SolveResult(x=c.x, fx=c.fx, grad=c.grad, gnorm=c.gnorm,
                           niter=c.k, nfev=c.nfev, status=c.status,
                           history=c.hist)

    return Solver(init=init, step=step, finalize=finalize, run=run,
                  run_fixed=run_fixed)


def minimize(fun: Optional[Callable] = None,
             x0: Array = None,
             params: LBFGSParams = LBFGSParams(),
             *,
             fun_and_grad=None,
             line_search="nocedalwright",
             axis_name: Optional[str] = None,
             history_dtype=None,
             direction: str = "sweeps",
             on_ls_fail: str = "stop") -> SolveResult:
    """Minimize ``fun`` from ``x0`` with L-BFGS.

    Mirrors ``LBFGSSolver::minimize`` (LBFGS.h:79-173).  ``line_search``
    defaults to Nocedal-Wright as in the reference (LBFGS.h:21).  Under
    ``shard_map`` pass the mesh ``axis_name``; every global reduction then
    becomes one collective.  ``history_dtype`` stores the (s, y) rows at
    reduced precision; ``on_ls_fail="restart"`` continues a failed
    instance from a curvature reset instead of stopping it (see
    :func:`solver`).
    """
    s = solver(fun, params, fun_and_grad=fun_and_grad,
               line_search=line_search, axis_name=axis_name,
               history_dtype=history_dtype, direction=direction,
               on_ls_fail=on_ls_fail)
    return s.finalize(s.run(s.init(x0)))


def final_approx_hessian(result: SolveResult) -> Array:
    """Dense approximate Hessian at the final iterate
    (``final_approx_hessian``, LBFGS.h:192)."""
    return hist_ops.bmat(result.history)


def final_approx_inverse_hessian(result: SolveResult) -> Array:
    """Dense approximate inverse Hessian at the final iterate
    (``final_approx_inverse_hessian``, LBFGS.h:197)."""
    return hist_ops.hmat(result.history)
