"""OWL-QN: L1-regularized L-BFGS (orthant-wise limited-memory quasi-Newton).

Minimizes ``f(x) = loss(x) + sum_i l1_i * |x_i|`` — the sparse-model
objective (lasso, sparse logistic regression).  The reference library is
"derived from the C library libLBFGS" (/root/reference/README.md:10-12) but
dropped libLBFGS's orthant-wise mode; this module restores that capability,
TPU-natively, per Andrew & Gao, "Scalable training of L1-regularized
log-linear models" (ICML 2007):

* the **pseudo-gradient** replaces the (non-existent) gradient of |x| at 0:
  for ``x_i = 0`` it is the smallest-magnitude subgradient if the orthant
  choice can decrease f, else 0;
* the two-loop direction is computed from the pseudo-gradient but the
  curvature history stores **loss-gradient** differences (the L1 term is
  piecewise linear — zero curvature);
* the direction is **sign-aligned** to the pseudo-descent orthant and the
  backtracking line search **projects** each trial point back onto the
  chosen orthant, so coordinates cross zero by landing EXACTLY on it —
  iterates are genuinely sparse, not merely small.

Per-coordinate ``l1`` weights are supported; coordinates with ``l1_i == 0``
are unpenalized and exempt from alignment/projection (libLBFGS's
``orthantwise_start/end`` ranges are the special case of a 0/λ mask).
Everything is fixed-shape masked arithmetic in one ``lax.while_loop`` —
jittable, vmappable, and the history machinery is shared with
:mod:`.lbfgs` (ring buffer, curvature gate, Gram-cached two-loop).

TPU note: f32 matmuls default to bf16 passes, whose ~1e-4 gradient noise
can sit above a tight ``epsilon`` on the pseudo-gradient; wrap matmul-built
objectives in ``jax.default_matmul_precision("float32")`` for convergence
at 1e-5 and below (measured: niter p50 150-cap -> 27 on a batched lasso,
PERF.md "New solver families").
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .ops import history as hist_ops
from .parallel import collectives as coll
from .params import LBFGSParams
from .types import SolveResult, Status

Array = jax.Array


def pseudo_gradient(x: Array, g: Array, lam: Array) -> Array:
    """Andrew & Gao's pseudo-gradient of ``loss + lam·|x|``.

    At ``x_i != 0`` it is ``g_i + lam_i*sign(x_i)``; at ``x_i == 0`` it is
    ``g_i + lam_i`` if negative, ``g_i - lam_i`` if positive, else 0 (no
    first-order decrease available in either orthant).
    """
    # One-sided slopes at 0: into x_i > 0 the objective slope is g + lam
    # (d|x|/dx = +1); into x_i < 0 it is g - lam.  Descent into the right
    # orthant needs g + lam < 0; into the left needs g - lam > 0.
    right = g + lam
    left = g - lam
    at_zero = jnp.where(right < 0, right, jnp.where(left > 0, left, 0.0))
    return jnp.where(x != 0, g + lam * jnp.sign(x), at_zero)


class OWLQNState(NamedTuple):
    k: Array
    x: Array
    fx: Array          # loss + L1 (the full objective)
    grad: Array        # LOSS gradient at x
    pgrad: Array       # pseudo-gradient at x
    gnorm: Array       # ||pseudo-gradient||_2
    hist: Any
    fx_ring: Array
    done: Array
    status: Array
    nfev: Array


def _retrace_at_precision(f: Optional[Callable], prec: str):
    """Wrap a callable so everything it traces uses matmul precision
    ``prec`` (innermost context wins, so a user's own precision choice
    inside ``f`` is respected)."""
    if f is None:
        return None

    def wrapped(*args):
        with jax.default_matmul_precision(prec):
            return f(*args)

    return wrapped


def minimize_owlqn(fun: Optional[Callable] = None,
                   x0: Array = None,
                   l1: Any = None,
                   params: LBFGSParams = LBFGSParams(),
                   *,
                   fun_and_grad=None,
                   history_dtype=None,
                   axis_name: Optional[str] = None,
                   fast_phase_epsilon: Optional[float] = None) -> SolveResult:
    """Minimize ``fun(x) + sum(l1 * |x|)`` with OWL-QN.

    Args:
      fun: the SMOOTH part of the objective (its gradient via autodiff), or
        pass ``fun_and_grad`` returning ``(loss, grad_loss)``.
      l1: scalar or ``[n]`` nonnegative weights.  Entries equal to 0 leave
        those coordinates unpenalized (plain quasi-Newton updates there).
      params: ``epsilon``/``epsilon_rel`` test the pseudo-gradient norm
        (convergence at a sparse solution means KKT stationarity);
        ``ftol``, ``max_linesearch``, ``m``, ``past``/``delta``,
        ``max_iterations`` keep their meanings.  The line search is the
        projected backtracking Armijo search of the OWL-QN paper (the
        Wolfe menu does not apply: the projected objective is only
        directionally differentiable).
      fast_phase_epsilon: enables the TPU *two-phase matmul-precision
        schedule* for matmul-built objectives (lasso, sparse logreg).
        TPU f32 matmuls default to bf16 passes whose ~1e-4 gradient noise
        sits above a tight ``epsilon``; the standard fix — tracing the
        whole solve under ``jax.default_matmul_precision("float32")`` —
        costs ~1.8x per evaluation (PERF.md "New solver families").
        With this set, phase 1 runs at the ambient (fast) precision down
        to ``max(epsilon, fast_phase_epsilon)`` (the noise floor), then
        phase 2 restarts from that iterate with the objective re-traced
        under float32 precision and finishes to ``params.epsilon`` — the
        expensive passes are paid only for the endgame iterations.
        ``niter``/``nfev`` accumulate across both phases; each phase is
        individually bounded by ``params.max_iterations``.

    Returns a :class:`~.types.SolveResult`: ``fx`` is the FULL objective,
    ``grad`` the loss gradient, ``gnorm`` the pseudo-gradient norm.
    Coordinates at zero are exact zeros.
    """
    if fast_phase_epsilon is not None:
        import dataclasses
        coarse = dataclasses.replace(
            params, epsilon=max(params.epsilon, float(fast_phase_epsilon)))
        r1 = minimize_owlqn(fun, x0, l1, coarse, fun_and_grad=fun_and_grad,
                            history_dtype=history_dtype, axis_name=axis_name)
        r2 = minimize_owlqn(_retrace_at_precision(fun, "float32"),
                            r1.x, l1, params,
                            fun_and_grad=_retrace_at_precision(fun_and_grad,
                                                               "float32"),
                            history_dtype=history_dtype, axis_name=axis_name)
        return r2._replace(niter=r1.niter + r2.niter,
                           nfev=r1.nfev + r2.nfev)

    if fun_and_grad is None:
        if fun is None:
            raise ValueError("either 'fun' or 'fun_and_grad' must be given")
        fg = jax.value_and_grad(fun)
    else:
        fg = fun_and_grad

    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    n = x0.shape[0]
    lam = jnp.broadcast_to(jnp.asarray(l1, dtype), (n,))
    penalized = lam > 0
    fpast = params.past
    ftol = jnp.asarray(params.ftol, dtype)

    def full_obj(x):
        loss, g = fg(x)
        l1_term = coll.psum_scalar(jnp.sum(lam * jnp.abs(x)), axis_name)
        return loss + l1_term, g

    def init(x0):
        fx0, g0 = full_obj(x0)
        pg0 = pseudo_gradient(x0, g0, lam)
        gnorm0 = coll.pnorm(pg0, axis_name)
        early = (gnorm0 <= params.epsilon) | \
            (gnorm0 <= params.epsilon_rel * coll.pnorm(x0, axis_name))
        ring_len = max(fpast, 1)
        fx_ring = jnp.zeros((ring_len,), dtype)
        if fpast > 0:
            fx_ring = fx_ring.at[0].set(fx0)
        hist0 = hist_ops.init_history(n, params.m, dtype,
                                      store_dtype=history_dtype)
        if axis_name is not None:
            # Shard-local history rows are device-varying under shard_map.
            hist0 = hist0._replace(s=coll.pvary(hist0.s, axis_name),
                                   y=coll.pvary(hist0.y, axis_name))
        return OWLQNState(
            k=jnp.ones((), jnp.int32), x=x0, fx=fx0, grad=g0, pgrad=pg0,
            gnorm=gnorm0,
            hist=hist0,
            fx_ring=fx_ring, done=early,
            status=jnp.where(early, jnp.int32(Status.CONVERGED_GRAD),
                             jnp.int32(Status.RUNNING)),
            nfev=jnp.ones((), jnp.int32))

    class _LS(NamedTuple):
        step: Array
        x: Array
        fx: Array
        grad: Array
        it: Array
        done: Array
        status: Array

    def body(c: OWLQNState) -> OWLQNState:
        # Direction from the pseudo-gradient through the loss-curvature
        # history, then orthant alignment: zero any component that is not
        # a descent component of the pseudo-gradient (Andrew & Gao §3,
        # "constrain the search direction to the orthant of -pseudo-grad").
        d = hist_ops.apply_hv(c.hist, c.pgrad, -1.0, axis_name)
        d = jnp.where(penalized & (d * c.pgrad >= 0), 0.0, d)

        # Chosen orthant: current sign, else the pseudo-descent sign.
        xi = jnp.where(c.x != 0, jnp.sign(c.x), jnp.sign(-c.pgrad))

        dg = coll.pdot(c.pgrad, d, axis_name)
        bad_dir = dg >= 0  # no descent available along d

        step0 = jnp.where(c.k == 1,
                          1.0 / jnp.maximum(coll.pnorm(d, axis_name),
                                            jnp.finfo(dtype).tiny),
                          jnp.ones((), dtype))

        def project(xt):
            return jnp.where(penalized & (xt * xi <= 0), 0.0, xt)

        def ls_cond(s: _LS):
            return ~s.done

        def ls_body(s: _LS):
            xt = project(c.x + s.step * d)
            ft, gt = full_obj(xt)
            # Armijo on the projected step (the paper's acceptance rule):
            # f(xt) <= f(x) + ftol * pg·(xt - x).
            dec = coll.pdot(c.pgrad, xt - c.x, axis_name)
            ok = ft <= c.fx + ftol * dec
            it = s.it + 1
            exhausted = it >= params.max_linesearch
            too_small = s.step * 0.5 < params.min_step
            status = jnp.where(
                ok, jnp.int32(Status.RUNNING),
                jnp.where(exhausted, jnp.int32(Status.LS_MAX_LINESEARCH),
                          jnp.where(too_small,
                                    jnp.int32(Status.LS_STEP_TOO_SMALL),
                                    jnp.int32(Status.RUNNING))))
            done = ok | exhausted | too_small
            return _LS(step=jnp.where(done, s.step, s.step * 0.5),
                       x=jnp.where(ok, xt, s.x),
                       fx=jnp.where(ok, ft, s.fx),
                       grad=jnp.where(ok, gt, s.grad),
                       it=it, done=done, status=status)

        ls0 = _LS(step=step0, x=c.x, fx=c.fx, grad=c.grad,
                  it=jnp.zeros((), jnp.int32),
                  done=bad_dir, status=jnp.where(
                      bad_dir, jnp.int32(Status.LS_NOT_DESCENT),
                      jnp.int32(Status.RUNNING)))
        ls = lax.while_loop(ls_cond, ls_body, ls0)
        ls_fail = ls.status != jnp.int32(Status.RUNNING)
        nfev = c.nfev + ls.it

        pg1 = pseudo_gradient(ls.x, ls.grad, lam)
        gnorm1 = coll.pnorm(pg1, axis_name)
        conv_grad = (gnorm1 <= params.epsilon) | \
            (gnorm1 <= params.epsilon_rel * coll.pnorm(ls.x, axis_name))

        if fpast > 0:
            fxd = c.fx_ring[c.k % fpast]
            conv_past = (c.k >= fpast) & \
                (jnp.abs(fxd - ls.fx) <= params.delta *
                 jnp.maximum(jnp.maximum(jnp.abs(ls.fx), jnp.abs(fxd)),
                             1.0))
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

        # Curvature from LOSS gradients (the L1 part has none).
        s_vec = ls.x - c.x
        y_vec = ls.grad - c.grad
        hist, _ = hist_ops.update_history(c.hist, s_vec, y_vec, ~ls_fail,
                                           axis_name)

        return OWLQNState(
            k=jnp.where(done, c.k, c.k + 1),
            x=ls.x, fx=ls.fx, grad=ls.grad, pgrad=pg1, gnorm=gnorm1,
            hist=hist, fx_ring=fx_ring, done=done, status=status,
            nfev=nfev)

    state = init(x0)
    state = lax.while_loop(lambda s: ~s.done,
                           lambda s: lax.cond(s.done, lambda t: t, body, s),
                           state)
    return SolveResult(x=state.x, fx=state.fx, grad=state.grad,
                       gnorm=state.gnorm, niter=state.k, nfev=state.nfev,
                       status=state.status, history=state.hist)
