"""Box-constrained L-BFGS-B solver.

TPU-native re-design of the reference driver
(/root/reference/include/LBFGSB.h): the whole ``minimize`` loop
(LBFGSB.h:117-262) is one ``lax.while_loop`` over an explicit state pytree —
projection to the feasible box, generalized Cauchy point, BOXCQP subspace
minimization, and a feasibility-capped Moré-Thuente line search — so a solve
is a single traced XLA computation, jittable and ``vmap``-pable.

Algorithmic invariants preserved from the reference:

* initial iterate projected into the box (LBFGSB.h:128) and the initial
  direction ``normalize(xcp - x)`` (LBFGSB.h:163-164);
* convergence on the infinity norm of the *projected* gradient
  ``||P(x - g, lb, ub) - x||_inf <= max(eps, eps_rel ||x||)``
  (LBFGSB.h:62-65, :146, :213) plus the past/delta objective test;
* per-iteration feasibility cap ``step_max`` (min-reduce over bound gaps,
  LBFGSB.h:68-86) with ``step0 = min(1, step_max)`` (LBFGSB.h:200-202);
* the pathological-direction rescue: if ``dg >= 0`` or
  ``step_max <= min_step``, reset the direction to ``xcp - x`` AND reset the
  whole BFGS matrix (LBFGSB.h:181-197);
* curvature-gated history update ``s'y > eps_machine * y'y`` (LBFGSB.h:237);
* the GCP is computed at the *projected* iterate but with the line-search
  gradient (force_bounds then Cauchy, LBFGSB.h:240-241), exactly as the
  reference orders it.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .linesearch import get_line_search
from .ops import bmat, cauchy, subspace
from .parallel import collectives as coll
from .params import LBFGSBParams
from .types import (SolveResult, Status, make_fun_and_grad, tree_select,
                    freeze_when)

Array = jax.Array


def force_bounds(x: Array, lb: Array, ub: Array) -> Array:
    """Project onto the box (LBFGSB.h:55-58)."""
    return jnp.minimum(jnp.maximum(x, lb), ub)


def proj_grad_norm(x: Array, g: Array, lb: Array, ub: Array,
                   axis_name: Optional[str] = None) -> Array:
    """``||P(x - g, lb, ub) - x||_inf`` (LBFGSB.h:62-65)."""
    return coll.pmax_abs(force_bounds(x - g, lb, ub) - x, axis_name)


def max_step_size(x: Array, drt: Array, lb: Array, ub: Array,
                  axis_name: Optional[str] = None) -> Array:
    """Largest step keeping ``x + step * drt`` in the box: one min-reduce
    (LBFGSB.h:68-86)."""
    dtype = x.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    per = jnp.where(drt > 0.0, (ub - x) / drt,
                    jnp.where(drt < 0.0, (lb - x) / drt, inf))
    return coll.pmin(jnp.min(per), axis_name)


class LBFGSBState(NamedTuple):
    """Full L-BFGS-B solver state — the ``lax.while_loop`` carry; an
    explicit pytree, so checkpoint = serialize, resume = pass it back."""

    k: Array
    x: Array
    fx: Array
    grad: Array
    projgnorm: Array
    drt: Array
    xcp: Array
    hist: bmat.BHistory
    fx_ring: Array
    done: Array
    status: Array
    nfev: Array


# Backwards-compatible private alias
_Carry = LBFGSBState


def _resolve_gcp(gcp: str, axis_name) -> str:
    """Route the GCP implementation choice for sharded solves.

    "scan" (the reference's sequential sorted walk, Cauchy.h:131-256) and
    "prefix" (the closed-form no-stop trajectory) are single-device
    formulations: both reduce over the full coordinate vector with no
    collectives, so under feature sharding each shard would silently
    compute a GCP for its local slice as if it were the whole problem.
    Any sharded solve therefore routes to the sortless segment-walk
    family — no distributed sort.  ``"auto"`` under sharding selects
    the runtime-routed ``walk_auto`` (plain walk near the active set,
    chunked walk for crossing-heavy rounds at the measured >= 16-crossing
    threshold — `scripts/probe_walk_switchover.py`, PERF.md round-5);
    any other single-device name falls back to the plain walk."""
    if axis_name is not None and gcp not in ("walk", "walk_chunked",
                                             "walk_auto"):
        return "walk_auto" if gcp == "auto" else "walk"
    if axis_name is None and gcp == "auto":
        # single-device: the reference-order scan is valid at any n (the
        # batched n-threshold routing lives in batch.minimize_b_batched)
        return "scan"
    return gcp


def solver(fun: Optional[Callable] = None,
           lb: Array = None,
           ub: Array = None,
           params: LBFGSBParams = LBFGSBParams(),
           *,
           fun_and_grad=None,
           line_search="morethuente",
           axis_name: Optional[str] = None,
           gcp: str = "scan",
           unroll_subspace: bool = False,
           middle_solve=None):
    """Build the L-BFGS-B ``init/step/finalize`` triple (see
    :func:`lbfgspp_tpu.lbfgs.solver`); bounds are closed over.

    ``gcp`` selects the generalized-Cauchy-point implementation:
    ``"scan"`` (default) is the sequential sorted walk matching the
    reference's summation order bit-for-bit; ``"prefix"`` re-expresses the
    walk as parallel prefix sums (:func:`..ops.cauchy.cauchy_point_prefix`)
    — the batched fast path (same index sets, reassociated sums);
    ``"prefix_sorted"`` is the same closed form with argsort+gather
    permutation — the large-n single-instance path (O(n log n), e.g. an
    early GCP from an interior start crosses ~n break points, which costs
    the scan/walk ~n sequential steps but the prefix form none).
    ``unroll_subspace`` statically unrolls the BOXCQP active-set loop
    (identical values; see :func:`..ops.subspace.subspace_minimize`).

    ``middle_solve`` selects the 2m x 2m middle-matrix solve: ``"gj"``
    is the statically-unrolled Gauss-Jordan elimination —
    algebraically the reference's solve, TPU/vmap-friendly; ``"bkldlt"``
    is the faithful Bunch-Kaufman LDL' with rook pivoting the reference
    factorizes on every correction (BFGSMat.h:52, :143-145, :558;
    BKLDLT.h:390-441).  Either way a failed/zero pivot latches the
    factorization's NUMERICAL_ISSUE status (BKLDLT.h:15-20) into the
    result: ``SolveResult.numerical_issue`` (the reference computes this
    status but silently discards it — here it reaches the caller)."""
    from .lbfgs import Solver

    gcp = _resolve_gcp(gcp, axis_name)
    bmat._resolve_middle_solve(middle_solve)   # eager validation

    fg = make_fun_and_grad(fun, fun_and_grad)
    search = get_line_search(line_search)

    gcp_fn = cauchy.GCP_IMPLS[gcp]

    def init(x0: Array) -> LBFGSBState:
        x0 = jnp.asarray(x0)
        dtype = x0.dtype
        lbb = jnp.broadcast_to(jnp.asarray(lb, dtype), x0.shape)
        ubb = jnp.broadcast_to(jnp.asarray(ub, dtype), x0.shape)
        return _init(fg, x0, lbb, ubb, params, axis_name, gcp_fn,
                     middle_solve)

    def step(c: LBFGSBState) -> LBFGSBState:
        dtype = c.x.dtype
        lbb = jnp.broadcast_to(jnp.asarray(lb, dtype), c.x.shape)
        ubb = jnp.broadcast_to(jnp.asarray(ub, dtype), c.x.shape)
        return freeze_when(
            c.done, c,
            lambda s: _body(fg, search, s, lbb, ubb, params, axis_name,
                            gcp_fn, unroll_subspace, middle_solve))

    def run(c: LBFGSBState) -> LBFGSBState:
        return lax.while_loop(lambda s: ~s.done, step, c)

    def run_fixed(c: LBFGSBState, iters: int) -> LBFGSBState:
        return lax.fori_loop(0, iters, lambda _, s: step(s), c,
                             unroll=False)

    def finalize(c: LBFGSBState) -> SolveResult:
        return SolveResult(x=c.x, fx=c.fx, grad=c.grad, gnorm=c.projgnorm,
                           niter=c.k, nfev=c.nfev, status=c.status,
                           history=c.hist)

    return Solver(init=init, step=step, finalize=finalize, run=run,
                  run_fixed=run_fixed)


def _init(fg, x0, lb, ub, params, axis_name, gcp_fn=cauchy.cauchy_point,
          middle_solve=None):
    dtype = x0.dtype
    n = x0.shape[0]
    fpast = params.past

    # Project the initial point into the box (LBFGSB.h:128).
    x0 = force_bounds(x0, lb, ub)
    fx0, grad0 = fg(x0)
    pg0 = proj_grad_norm(x0, grad0, lb, ub, axis_name)

    ring_len = max(fpast, 1)
    fx_ring = jnp.zeros((ring_len,), dtype)
    if fpast > 0:
        fx_ring = fx_ring.at[0].set(fx0)

    # Early exit if x0 already minimizes (LBFGSB.h:146-149).
    early = (pg0 <= params.epsilon) | \
        (pg0 <= params.epsilon_rel * coll.pnorm(x0, axis_name))

    hist0 = bmat.init_b_history(n, params.m, dtype, middle_solve)
    if axis_name is not None:
        base = hist0.base._replace(s=coll.pvary(hist0.base.s, axis_name),
                                   y=coll.pvary(hist0.base.y, axis_name))
        hist0 = hist0._replace(base=base)
    cp0 = gcp_fn(hist0, x0, grad0, lb, ub, axis_name)
    d0 = cp0.xcp - x0
    d0_norm = coll.pnorm(d0, axis_name)
    drt0 = jnp.where(d0_norm > 0.0, d0 / jnp.where(d0_norm > 0.0, d0_norm,
                                                   1.0), d0)

    return LBFGSBState(
        k=jnp.ones((), jnp.int32),
        x=x0, fx=fx0, grad=grad0, projgnorm=pg0, drt=drt0, xcp=cp0.xcp,
        hist=hist0, fx_ring=fx_ring,
        done=early,
        status=jnp.where(early, jnp.int32(Status.CONVERGED_GRAD),
                         jnp.int32(Status.RUNNING)),
        nfev=jnp.ones((), jnp.int32))


def _body(fg, search, c, lb, ub, params, axis_name,
          gcp_fn=cauchy.cauchy_point, unroll_subspace=False,
          middle_solve=None):
    """One outer iteration (LBFGSB.h:171-258)."""
    dtype = c.x.dtype
    n = c.x.shape[0]
    fpast = params.past
    xp, gradp = c.x, c.grad
    dg = coll.pdot(c.grad, c.drt, axis_name)
    step_max = max_step_size(c.x, c.drt, lb, ub, axis_name)

    # Pathological-direction rescue (LBFGSB.h:181-197).
    patho = (dg >= 0.0) | (step_max <= params.min_step)
    drt = jnp.where(patho, c.xcp - c.x, c.drt)
    fresh = bmat.init_b_history(n, params.m, dtype, middle_solve)
    if axis_name is not None:
        fresh = fresh._replace(base=fresh.base._replace(
            s=coll.pvary(fresh.base.s, axis_name),
            y=coll.pvary(fresh.base.y, axis_name)))
    hist = tree_select(patho, fresh, c.hist)
    dg = jnp.where(patho, coll.pdot(c.grad, drt, axis_name), dg)
    step_max = jnp.where(
        patho, max_step_size(c.x, drt, lb, ub, axis_name), step_max)

    # Line search capped at step_max (LBFGSB.h:200-203).
    step_max = jnp.minimum(jnp.asarray(params.max_step, dtype), step_max)
    step0 = jnp.minimum(jnp.ones((), dtype), step_max)
    ls = search(fg, params, xp, drt, step_max, step0, c.fx, c.grad, dg,
                axis_name=axis_name)
    nfev = c.nfev + ls.nfev

    projgnorm = proj_grad_norm(ls.x, ls.grad, lb, ub, axis_name)
    ls_fail = ls.status != jnp.int32(Status.RUNNING)

    # Convergence tests (LBFGSB.h:212-230).
    conv_grad = (projgnorm <= params.epsilon) | \
        (projgnorm <= params.epsilon_rel * coll.pnorm(ls.x, axis_name))
    if fpast > 0:
        fxd = c.fx_ring[c.k % fpast]
        conv_past = (c.k >= fpast) & \
            (jnp.abs(fxd - ls.fx) <= params.delta *
             jnp.maximum(jnp.maximum(jnp.abs(ls.fx), jnp.abs(fxd)), 1.0))
        fx_ring = c.fx_ring.at[c.k % fpast].set(ls.fx)
    else:
        conv_past = jnp.zeros((), bool)
        fx_ring = c.fx_ring
    max_iter = (params.max_iterations != 0) & \
        (c.k >= params.max_iterations)

    done = ls_fail | conv_grad | conv_past | max_iter
    status = jnp.where(
        ls_fail, ls.status,
        jnp.where(conv_grad, jnp.int32(Status.CONVERGED_GRAD),
                  jnp.where(conv_past, jnp.int32(Status.CONVERGED_DELTA),
                            jnp.where(max_iter,
                                      jnp.int32(Status.MAX_ITERATIONS),
                                      jnp.int32(Status.RUNNING)))))

    # History update with curvature gate (LBFGSB.h:232-238); gate and
    # all incremental middle-matrix products share one fused collective.
    s = ls.x - xp
    y = ls.grad - gradp
    hist, _ = bmat.update_history_b(hist, s, y, ~done, axis_name,
                                    middle_solve)

    # Projection, GCP and subspace phase (LBFGSB.h:240-250).  On the
    # terminating iteration the reference returns the line-search x
    # before re-projecting, so keep ls.x when done.
    x_next = force_bounds(ls.x, lb, ub)
    cp = gcp_fn(hist, x_next, ls.grad, lb, ub, axis_name)
    drt_next, sub_info = subspace.subspace_minimize(
        hist, x_next, cp.xcp, ls.grad, lb, ub, cp.vecc,
        cp.newact_mask, cp.free_mask, params.max_submin, axis_name,
        unroll=unroll_subspace, middle_solve=middle_solve)
    # Latch any failed middle-matrix factorization into the history's
    # visible info flag (SolveResult.history.info; the reference ignores
    # factorization status, BFGSMat.h:558 — this is observability only).
    hist = hist._replace(info=jnp.maximum(hist.info, sub_info))

    return LBFGSBState(
        k=jnp.where(done, c.k, c.k + 1),
        x=jnp.where(done, ls.x, x_next),
        fx=ls.fx, grad=ls.grad, projgnorm=projgnorm,
        drt=drt_next, xcp=cp.xcp, hist=hist, fx_ring=fx_ring,
        done=done, status=status, nfev=nfev)


def minimize(fun: Optional[Callable] = None,
             x0: Array = None,
             lb: Array = None,
             ub: Array = None,
             params: LBFGSBParams = LBFGSBParams(),
             *,
             fun_and_grad=None,
             line_search="morethuente",
             axis_name: Optional[str] = None,
             gcp: str = "scan",
             middle_solve=None) -> SolveResult:
    """Minimize ``fun`` over the box ``[lb, ub]`` from ``x0`` with L-BFGS-B.

    Mirrors ``LBFGSBSolver::minimize`` (LBFGSB.h:117-262).  ``line_search``
    defaults to More-Thuente as in the reference (LBFGSB.h:22) — it is the
    only search honoring ``step_max``.  ``lb``/``ub`` entries may be
    ``+/-inf``, and ``lb[i] == ub[i]`` pins a variable (Cauchy.h:113-114).
    ``gcp`` selects the Cauchy-point implementation (see :func:`solver`;
    use ``"prefix_sorted"`` for large single-instance n).
    ``middle_solve`` routes the 2m x 2m middle-matrix systems:
    ``"gj"`` or ``"bkldlt"`` (the reference's Bunch-Kaufman,
    see :func:`solver`); a failed factorization surfaces as
    ``SolveResult.numerical_issue``.
    """
    s = solver(fun, lb, ub, params, fun_and_grad=fun_and_grad,
               line_search=line_search, axis_name=axis_name, gcp=gcp,
               middle_solve=middle_solve)
    return s.finalize(s.run(s.init(x0)))
