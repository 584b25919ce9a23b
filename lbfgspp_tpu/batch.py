"""Batch-axis convenience API.

The batch axis is plain ``jax.vmap`` of a whole solve (the drivers'
frozen-carry masking makes per-instance termination exact); these wrappers
package the common patterns — a batch of starts against one objective, or
a batch of problem instances via in_axes — with jit applied.

The reference's closest analog is the sequential 1024-start loops in its
examples (example-rosenbrock-bracketing.cpp:44); here the whole sweep is
one device launch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .params import LBFGSParams, LBFGSBParams
from .types import SolveResult
from . import lbfgs, lbfgsb

Array = jax.Array


def polish_solve(fun: Optional[Callable], x0: Array,
                 params: LBFGSParams,
                 iters: int,
                 *,
                 fun_and_grad=None,
                 line_search: str = "morethuente") -> SolveResult:
    """Refine a stalled f32 solution with up to ``iters`` L-BFGS iterations
    in *double-float pair space* (:mod:`.utils.doublefloat`).

    A pure-f32 solve hits two walls the reference (which assumes double,
    README.md:88-94) never sees: the gradient evaluation rounding floor,
    and — more fundamentally — the ``ulp(x)`` wall: near the optimum the
    useful quasi-Newton step is smaller than the spacing of f32 numbers at
    ``x``, so every line-search trial rounds back to ``x`` and NO f32
    method can progress.  The polish phase optimizes over the paired
    variables ``[hi; lo]`` (2n ordinary f32 coordinates) with the objective
    and gradient evaluated at the exact sum in df64 arithmetic
    (:func:`~.utils.doublefloat.df64_pair_fun_and_grad`): big moves land in
    ``hi``, sub-ulp moves accumulate in ``lo``, and the unchanged f32
    solver machinery recovers reference-grade (double-precision-criterion)
    solutions on f32 hardware.

    The returned ``history`` is an empty [m, n] history (the polish
    curvature lives in pair space and does not transfer); Hessian
    accessors on it give ``theta * I``.
    """
    from .utils import doublefloat as dfl

    from .ops import history as hist_ops

    fg2 = dfl.df64_pair_fun_and_grad(fun, fun_and_grad=fun_and_grad)
    pparams = dataclasses.replace(params, max_iterations=iters)
    s = lbfgs.solver(fun_and_grad=fg2, params=pparams,
                     line_search=line_search)
    n = x0.shape[0]
    x2 = jnp.concatenate([x0, jnp.zeros_like(x0)])
    res2 = s.finalize(s.run(s.init(x2)))
    x = dfl.pair_to_float(res2.x)
    grad = res2.grad[:n]
    # The polish solver's curvature pairs live in pair space ([m, 2n]);
    # they are meaningless for the returned [n] iterate, so the result
    # carries a shape-consistent EMPTY history (ncorr=0 -> B = theta*I)
    # rather than a mismatched one.  minimize_batched substitutes the
    # main phase's real history via _merge_polished.
    return SolveResult(x=x, fx=res2.fx, grad=grad,
                       gnorm=jnp.linalg.norm(grad),
                       niter=res2.niter, nfev=res2.nfev,
                       status=res2.status,
                       history=hist_ops.init_history(n, params.m, x.dtype))


def _merge_polished(res: SolveResult, pol: SolveResult) -> SolveResult:
    """Combine main + polish phases: iterates from the polish phase,
    counters summed, history (in original-space shape) from the main
    phase."""
    return SolveResult(x=pol.x, fx=pol.fx, grad=pol.grad, gnorm=pol.gnorm,
                       niter=res.niter + pol.niter, nfev=res.nfev + pol.nfev,
                       status=pol.status, history=res.history)


def minimize_batched(fun: Optional[Callable] = None,
                     x0s: Array = None,
                     params: LBFGSParams = LBFGSParams(),
                     *,
                     fun_and_grad=None,
                     line_search: str = "nocedalwright",
                     jit: bool = True,
                     mesh=None,
                     batch_axis: str = "batch",
                     polish_iters: int = 0) -> SolveResult:
    """Solve one objective from a batch of starts ``x0s [B, n]``.

    Returns a :class:`SolveResult` with a leading batch axis on every
    field.  Tip: batch mode runs until the slowest instance terminates, so
    set ``params.max_iterations`` (the reference's 0 = unlimited would let
    one diverged instance stall the whole batch).

    Pass ``mesh`` (a 1-D `jax.sharding.Mesh`) to scale the batch over
    multiple chips data-parallel: instances are independent, so the jitted
    vmap partitions along the batch axis with ZERO collectives — each chip
    runs its shard of instances.  (This is the multi-chip throughput axis;
    the feature axis lives in :mod:`.parallel.sharded`.)

    ``polish_iters > 0`` appends a df64 polish phase (:func:`polish_solve`)
    starting from each instance's final iterate (the curvature history
    restarts — it lives in pair space there) with the same ``line_search``
    — on f32 hardware this recovers the reference's double-precision
    solution quality at a few extra iterations' cost.
    """
    def solve_one(x0):
        res = lbfgs.minimize(fun, x0, params, fun_and_grad=fun_and_grad,
                             line_search=line_search)
        if polish_iters:
            pol = polish_solve(fun, res.x, params, polish_iters,
                               fun_and_grad=fun_and_grad,
                               line_search=line_search)
            res = _merge_polished(res, pol)
        return res

    f = jax.vmap(solve_one)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(batch_axis))
        x0s = jax.device_put(jnp.asarray(x0s), sh)
        f = jax.jit(f)
    elif jit:
        f = jax.jit(f)
    return f(x0s)


def minimize_b_batched(fun: Optional[Callable] = None,
                       x0s: Array = None,
                       lb: Array = None,
                       ub: Array = None,
                       params: LBFGSBParams = LBFGSBParams(),
                       *,
                       fun_and_grad=None,
                       line_search: str = "morethuente",
                       jit: bool = True,
                       gcp: str = "auto",
                       unroll_subspace: bool = False) -> SolveResult:
    """Box-constrained batch solve; ``lb``/``ub`` are shared [n] bounds or
    per-instance [B, n].

    ``gcp="auto"`` picks the batched fast path — the prefix-sum GCP
    (all-parallel, no per-breakpoint scan; under ``vmap`` the sequential
    walk of the reference formulation serializes the whole batch at each
    tiny step) — when its O(n^2)-per-instance intermediates are cheap
    (n <= 128), and the memory-lean sequential scan for larger n.
    Measured on TPU (batch 1024, Rosenbrock n=10): prefix GCP 13.5k
    solves/s vs 1.5k for the scan walk; the statically-unrolled BOXCQP
    (``unroll_subspace=True``) measured *slower* (6.4k — it always pays
    all ``max_submin`` iterations, while the while_loop exits after the
    1-2 a typical subspace solve needs), so it stays off by default.
    Pass ``gcp="scan"`` for the bit-exact reference-order path at any
    size, or ``gcp="prefix"`` to force the fast path (reassociated sums,
    identical index sets)."""
    x0s = jnp.asarray(x0s)
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    per_instance = lb.ndim == 2
    if gcp == "auto":
        # prefix builds [n, n] per-instance intermediates ([B, n, n] under
        # vmap) — a big win for the small-n batched regime, an OOM risk
        # beyond it (B=4096, n=1024 f32 would be ~17 GB per temporary).
        gcp = "prefix" if x0s.shape[-1] <= 128 else "scan"

    def solve_one(x0, lbi, ubi):
        s = lbfgsb.solver(fun, lbi, ubi, params,
                          fun_and_grad=fun_and_grad,
                          line_search=line_search, gcp=gcp,
                          unroll_subspace=unroll_subspace)
        return s.finalize(s.run(s.init(x0)))

    in_axes = (0, 0, 0) if per_instance else (0, None, None)
    f = jax.vmap(solve_one, in_axes=in_axes)
    if jit:
        f = jax.jit(f)
    return f(x0s, lb, ub)
