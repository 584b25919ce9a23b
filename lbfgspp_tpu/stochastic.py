"""Multi-batch (stochastic) L-BFGS with overlap-consistent curvature.

The reference library is strictly full-batch — its objective is one
deterministic functor (README.md:19-22) — but the dominant TPU workload is
minibatched.  Naive minibatch L-BFGS fails because the curvature pair
``y_k = g_{k+1} - g_k`` differences gradients of DIFFERENT sample batches,
injecting sampling noise straight into the inverse-Hessian model.  The
multi-batch method of Berahas, Nocedal & Takáč (NeurIPS 2016,
arXiv:1605.06049; PAPERS.md) fixes this by giving consecutive batches an
overlap ``O_k = S_k ∩ S_{k+1}`` and forming

    s_k = x_{k+1} - x_k,   y_k = ∇f_{O_k}(x_{k+1}) - ∇f_{O_k}(x_k)

— the gradient difference on the SAME samples — so every stored pair is a
true (secant-consistent) curvature observation of a fixed sub-objective.
Everything else reuses this framework's deterministic machinery unchanged:
the ring-buffer history with the reference's curvature gate (LBFGS.h:161,
which doubles as the stochastic skip rule), the Gram-cached two-loop
direction, and the reference backtracking line search run on the current
batch's objective.

TPU-native shape: the whole run is ONE ``lax.scan`` over iterations with a
fixed batch schedule — a sliding window of ``batch_size`` rows over a
(optionally shuffled) index permutation, advancing ``batch_size - overlap``
rows per step so the window tail is exactly the next window's head.  Per
step: one batch gradient, the line-search evaluations on that batch, and
two overlap gradients (|O| rows each — cheap at the paper's recommended
20-25% overlap).

Works on flat vectors or any parameter pytree (raveled internally, as in
:mod:`.pytree`).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from .linesearch import get_line_search
from .ops import history as hist_ops
from .params import LBFGSParams
from .types import SolveResult, Status


def _num_rows(data) -> int:
    leaves = jax.tree.leaves(data)
    if not leaves:
        raise ValueError("'data' must contain at least one array")
    n = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.shape[0] != n:
            raise ValueError("all 'data' leaves must share the leading "
                             f"(sample) axis; got {leaf.shape[0]} vs {n}")
    return n


def minimize_stochastic(fun: Callable,
                        x0: Any,
                        data: Any,
                        params: LBFGSParams = LBFGSParams(),
                        *,
                        batch_size: int,
                        overlap_frac: float = 0.25,
                        step_size: Optional[float] = None,
                        line_search="backtracking",
                        key: Optional[jax.Array] = None,
                        history_dtype=None) -> SolveResult:
    """Run ``params.max_iterations`` multi-batch L-BFGS steps.

    Args:
      fun: ``fun(x, batch) -> scalar`` — the loss of parameters ``x`` on a
        batch (a pytree of arrays sliced along the leading axis).  ``x``
        may be a flat vector or any pytree.
      x0: initial parameters (array or pytree).
      data: pytree of arrays with a common leading sample axis.
      params: solver knobs.  ``max_iterations`` (> 0 required) is the step
        count — stochastic iterations have no minibatch convergence test,
        so the run is a fixed schedule; ``m``/``ftol``/``max_linesearch``
        etc. keep their deterministic meanings.
      batch_size: rows per step.
      overlap_frac: fraction of each batch shared with the next (the
        paper's ``o/b``; 0.2-0.25 recommended).  At ``batch_size == N``
        and ``overlap_frac == 1`` this is exactly deterministic full-batch
        L-BFGS with the chosen line search.
      step_size: fixed steplength; ``None`` runs the reference
        backtracking search on the current batch (pass
        ``params.linesearch = LINESEARCH_BACKTRACKING_ARMIJO`` for the
        paper's sufficient-decrease-only rule).
      line_search: search to use when ``step_size is None``.
      key: PRNG key to shuffle the sample order once up front; ``None``
        keeps the given order.  The same permutation is cycled (the
        sliding window wraps), matching the paper's cyclic variant.
      history_dtype: optional reduced-precision (s, y) storage.

    Returns:
      A :class:`~.types.SolveResult` whose ``fx``/``grad``/``gnorm`` are
      those of the LAST minibatch (report a full-data loss by evaluating
      ``fun(res.x, data)`` if wanted); ``status`` is always
      ``MAX_ITERATIONS`` (the run is a fixed schedule).  A step whose
      line search fails keeps ``x`` and the history unchanged — the bad
      batch is isolated and the schedule moves on.
    """
    if params.max_iterations <= 0:
        raise ValueError("stochastic mode needs params.max_iterations > 0 "
                         "(a fixed step schedule)")
    n_rows = _num_rows(data)
    if not 1 <= batch_size <= n_rows:
        raise ValueError(f"batch_size must be in [1, {n_rows}]")
    o = int(round(overlap_frac * batch_size))
    if not 1 <= o <= batch_size:
        raise ValueError("overlap_frac must give an overlap in "
                         "[1, batch_size] rows")
    shift = batch_size - o

    flat0, unravel = ravel_pytree(x0)
    dtype = flat0.dtype

    def fun_flat(z, batch):
        return fun(unravel(z), batch)

    perm = jnp.arange(n_rows)
    if key is not None:
        perm = jax.random.permutation(key, n_rows)
    # Tile once so a window starting anywhere in [0, N) slices statically.
    perm2 = jnp.concatenate([perm, perm])

    def take(idx):
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)

    search = get_line_search(line_search)
    hist0 = hist_ops.init_history(flat0.shape[0], params.m, dtype,
                                  store_dtype=history_dtype)

    class Carry(NamedTuple):
        x: jax.Array
        hist: Any
        fx: jax.Array
        gnorm: jax.Array
        grad: jax.Array
        nfev: jax.Array
        nskip: jax.Array  # line-search failures (step rejected)

    def body(c: Carry, k):
        start = (k * shift) % n_rows
        idx = lax.dynamic_slice_in_dim(perm2, start, batch_size)
        o_idx = idx[batch_size - o:]
        batch = take(idx)
        obatch = take(o_idx)

        fg = jax.value_and_grad(lambda z: fun_flat(z, batch))
        fx, g = fg(c.x)
        d = hist_ops.apply_hv(c.hist, g, -1.0)
        dg = jnp.vdot(g, d)

        if step_size is None:
            step0 = jnp.where(k == 0,
                              1.0 / jnp.linalg.norm(d),
                              jnp.ones((), dtype))
            ls = search(fg, params, c.x, d, params.max_step, step0, fx, g,
                        dg)
            ok = ls.status == jnp.int32(Status.RUNNING)
            x1 = jnp.where(ok, ls.x, c.x)
            fx1 = jnp.where(ok, ls.fx, fx)
            g1 = jnp.where(ok, ls.grad, g)
            nfev = c.nfev + 1 + ls.nfev
        else:
            x1 = c.x + jnp.asarray(step_size, dtype) * d
            fx1, g1 = fg(x1)
            ok = jnp.isfinite(fx1)
            x1 = jnp.where(ok, x1, c.x)
            nfev = c.nfev + 2

        # Overlap-consistent curvature pair (arXiv:1605.06049 eq. 2.5):
        # both gradients on O_k, so y measures true curvature.
        gfun = jax.grad(lambda z: fun_flat(z, obatch))
        y = gfun(x1) - gfun(c.x)
        s = x1 - c.x
        hist, _ = hist_ops.update_history(c.hist, s, y, ok)

        gnorm1 = jnp.linalg.norm(g1)
        out = Carry(x=x1, hist=hist, fx=fx1, gnorm=gnorm1, grad=g1,
                    nfev=nfev + 2, nskip=c.nskip + (~ok).astype(jnp.int32))
        return out, None

    init = Carry(x=flat0, hist=hist0,
                 fx=jnp.zeros((), dtype), gnorm=jnp.zeros((), dtype),
                 grad=jnp.zeros_like(flat0),
                 nfev=jnp.zeros((), jnp.int32),
                 nskip=jnp.zeros((), jnp.int32))
    final, _ = lax.scan(body, init, jnp.arange(params.max_iterations))

    return SolveResult(
        x=unravel(final.x), fx=final.fx, grad=unravel(final.grad),
        gnorm=final.gnorm,
        niter=jnp.asarray(params.max_iterations, jnp.int32),
        nfev=final.nfev,
        status=jnp.int32(Status.MAX_ITERATIONS),
        history=final.hist)
