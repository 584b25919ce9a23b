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
from .types import (SolveResult, Status, SUCCESS_STATUSES,
                    make_fun_and_grad)
from . import lbfgs, lbfgsb

Array = jax.Array


def _compact_refine(s2, x0s: Array, k_refine: int, k_stage1: int):
    """Two-stage batched solve with straggler compaction.

    Stage 1 runs the whole batch in lockstep for at most ``k_stage1``
    iterations.  Because a vmapped ``while_loop`` runs until the SLOWEST
    instance terminates, a handful of hard instances makes every easy
    instance pay masked (frozen-carry) iterations — on TPU that wall
    time is pure waste.  This helper sorts the stage-1 states so
    unconverged instances come first, takes the leading ``k_refine`` (a
    static shape), resumes only those to stage-2's cap, and scatters the
    states back.  The batch-level permutation costs two O(carry) gathers
    per solve — executed once, not per iteration.

    Stage 1 pauses via a bounded while-loop over the SAME solver's
    ``step`` rather than a smaller ``max_iterations``: hitting the
    reference's cap is lossy (the capped iteration's correction pair is
    discarded — the reference returns before ``add_correction``,
    LBFGS.h:151-162), while a pause splits the run at an iteration
    boundary with the full carry intact, so when every unconverged
    instance fits in ``k_refine`` the two-stage result is bit-identical
    to the uninterrupted run.  Converged instances are untouched (their
    carries are frozen no-ops even if selected); unconverged instances
    beyond ``k_refine`` keep their stage-1 iterate and report
    MAX_ITERATIONS.
    """
    from jax import lax

    c = jax.vmap(s2.init)(x0s)
    c = jax.vmap(lambda ci: lax.while_loop(
        lambda st: (~st.done) & (st.k <= k_stage1), s2.step, ci))(c)
    order = jnp.argsort(c.done.astype(jnp.int32), stable=True)
    cs = jax.tree.map(lambda a: a[order], c)
    head = jax.tree.map(lambda a: a[:k_refine], cs)
    head = jax.vmap(s2.run)(head)
    tail = jax.tree.map(lambda a: a[k_refine:], cs)
    # Stranded unconverged tail instances: report the budget stop.  A
    # paused carry holds k = iterations-performed + 1 (a cap-terminated
    # one holds k = iterations-performed), so align the reported count.
    tail = tail._replace(
        k=jnp.where(tail.done, tail.k, tail.k - 1),
        done=jnp.ones_like(tail.done),
        status=jnp.where(tail.done, tail.status,
                         jnp.int32(Status.MAX_ITERATIONS)))
    merged = jax.tree.map(lambda h, t: jnp.concatenate([h, t], axis=0),
                          head, tail)
    inv = jnp.argsort(order)
    return jax.tree.map(lambda a: a[inv], merged)


def _lift_history_pairs(hist, direction: str):
    """Lift an [m, n] correction history into pair space ([m, 2n], lo = 0).

    The main phase's curvature pairs are exact pair-space pairs with zero
    lo words, and every cached inner product (ys, theta, Grams) is
    unchanged by the zero-padding — so a polish solver can inherit the
    full Hessian model instead of rebuilding it from scratch.  The
    ``rinv`` factor is reconstructed from the Grams when the polish
    direction mode needs one the source history doesn't carry.
    """
    from .ops import history as hist_ops

    z = jnp.zeros_like(hist.s)
    rinv = hist.rinv
    if direction == "rinv" and rinv is None:
        rinv = hist_ops.rinv_from_grams(hist)
    elif direction != "rinv":
        rinv = None
    return hist._replace(s=jnp.concatenate([hist.s, z], axis=1),
                         y=jnp.concatenate([hist.y, z], axis=1),
                         rinv=rinv)


def polish_solve(fun: Optional[Callable], x0: Array,
                 params: LBFGSParams,
                 iters: int,
                 *,
                 fun_and_grad=None,
                 line_search: str = "morethuente",
                 drive: str = "while",
                 direction: str = "sweeps",
                 warm_history=None,
                 shift: bool = False,
                 on_ls_fail: str = "stop",
                 restarts: int = 1) -> SolveResult:
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

    ``warm_history``: the main phase's final [m, n] history.  Its pairs
    lift exactly into pair space (:func:`_lift_history_pairs`), so the
    polish starts with the full Hessian model already built — the first
    direction is the quasi-Newton ``-H g`` with unit step instead of the
    cold steepest-descent restart, and the same solution quality needs
    fewer df64 iterations (measured frontier in PERF.md).

    Regime boundary (measured, PERF.md "Warm-start polish"): the warm
    start wins when the polish is an ENDGAME refinement — instances near
    the acceptance criterion, the iteration-capped throughput regime the
    bench ships.  When the main phase stalled at the f32 ulp wall far
    from the criterion (generous budget, small n), its history pairs are
    rounding-scale steps, and a short polish makes MORE progress
    rebuilding curvature from clean df64 measurements than reusing them
    — use the cold restart there.

    ``shift=True`` subtracts the df64 objective value at ``x0`` INSIDE
    the polished objective, as a two-word (hi, lo) constant pair — the
    same device :func:`polish_solve_b` uses.  Required whenever the
    optimum's objective value is LARGE (``f* != 0``): the pair solver's
    carried fx is f32, so a decrease below ``ulp(f*)`` is invisible to
    the line search and the polish stalls at the f32 fx-resolution wall
    ``||g|| ~ sqrt(L * ulp(f*))`` exactly like the main phase (measured
    round-5 on batched logistic regression: without the shift 80 df64
    iterations move nothing; with it the same budget converges).  The
    Rosenbrock-family bench does not need it because ``f* = 0`` — fx
    resolution improves as instances converge.  Off by default (the
    shift changes evaluation bit patterns).

    ``restarts > 1`` runs that many sequential COLD-restart chunks of
    ``iters`` each (each re-shifted at its own start when ``shift``;
    ``warm_history`` applies to the first chunk only).  Measured
    round-5 (PERF.md "Does the recipe transfer"): a single long pair
    polish on transcendental objectives can stall with its search state
    wedged ~1e-4 above the true floor (300 iterations no progress),
    while a fresh restart from the same iterate converges in 10 — the
    same state-reset insight as ``on_ls_fail="restart"``, applied at
    the chunk boundary.  Converged instances exit each later chunk at
    the init gnorm test, so extra restarts are cheap once done.
    """
    from .utils import doublefloat as dfl

    from .ops import history as hist_ops

    if restarts > 1:
        res = polish_solve(fun, x0, params, iters,
                           fun_and_grad=fun_and_grad,
                           line_search=line_search, drive=drive,
                           direction=direction, warm_history=warm_history,
                           shift=shift, on_ls_fail=on_ls_fail)
        niter, nfev = res.niter, res.nfev
        for _ in range(restarts - 1):
            nxt = polish_solve(fun, res.x, params, iters,
                               fun_and_grad=fun_and_grad,
                               line_search=line_search, drive=drive,
                               direction=direction, shift=shift,
                               on_ls_fail=on_ls_fail)
            niter = niter + nxt.niter
            nfev = nfev + nxt.nfev
            res = nxt._replace(niter=niter, nfev=nfev)
        return res

    if shift:
        base_fg = make_fun_and_grad(fun, fun_and_grad)
        ref = dfl.df64ify(lambda z: base_fg(z)[0], to_native=False)(x0)
        chi = jax.lax.stop_gradient(ref.hi)
        clo = jax.lax.stop_gradient(ref.lo)

        def shifted_fg(z):
            fx, g = base_fg(z)
            return (fx - chi) - clo, g

        fg2 = dfl.df64_pair_fun_and_grad(fun_and_grad=shifted_fg)
    else:
        fg2 = dfl.df64_pair_fun_and_grad(fun, fun_and_grad=fun_and_grad)
    pparams = dataclasses.replace(params, max_iterations=iters)
    s = lbfgs.solver(fun_and_grad=fg2, params=pparams,
                     line_search=line_search, direction=direction,
                     on_ls_fail=on_ls_fail)
    n = x0.shape[0]
    x2 = jnp.concatenate([x0, jnp.zeros_like(x0)])
    st = s.init(x2)
    if warm_history is not None:
        h2 = _lift_history_pairs(warm_history, direction)
        drt = hist_ops.apply_hv(h2, st.grad, -1.0, tri=direction)
        st = st._replace(hist=h2, drt=drt,
                         step=jnp.ones((), x2.dtype))
    st = s.run_fixed(st, iters) if drive == "fixed" else s.run(st)
    res2 = s.finalize(st)
    x = dfl.pair_to_float(res2.x)
    grad = res2.grad[:n]
    fx_out = (res2.fx + clo) + chi if shift else res2.fx
    # the shift's df64 reference evaluation at x0 counts as one nfev
    # (polish_solve_b enumerates its wrapper evaluations the same way)
    nfev_out = res2.nfev + 1 if shift else res2.nfev
    # The polish solver's curvature pairs live in pair space ([m, 2n]);
    # they are meaningless for the returned [n] iterate, so the result
    # carries a shape-consistent EMPTY history (ncorr=0 -> B = theta*I)
    # rather than a mismatched one.  minimize_batched substitutes the
    # main phase's real history via _merge_polished.
    return SolveResult(x=x, fx=fx_out, grad=grad,
                       gnorm=jnp.linalg.norm(grad),
                       niter=res2.niter, nfev=nfev_out,
                       status=res2.status,
                       history=hist_ops.init_history(n, params.m, x.dtype))


def polish_solve_b(fun: Optional[Callable], x0: Array,
                   lb: Array, ub: Array,
                   params: LBFGSParams,
                   iters: int,
                   *,
                   fun_and_grad=None,
                   active_tol: float = 1e-3,
                   line_search: str = "morethuente",
                   direction: str = "sweeps",
                   prior: Optional[SolveResult] = None) -> SolveResult:
    """Active-set df64 polish for BOX-constrained f32 solutions.

    An f32 box solve terminates at the f32 objective plateau: near a
    bound-pinned optimum an x error of ~1e-4 changes fx by less than
    ``ulp(fx)``, so the past/delta decrease test (LBFGSB.h:218-225)
    legitimately fires while coordinates are still ~1e-4 off their
    bounds — invisible to any f32 refinement and to more iterations.
    This is the box analog of :func:`polish_solve`, via the classic
    active-set polish:

    1. classify coordinates as active using the converged iterate and
       gradient signs: at (within ``active_tol`` of) the lower bound
       with ``g >= 0``, or of the upper bound with ``g <= 0`` —
       KKT-consistent bound activity;
    2. pin active coordinates EXACTLY to their bound (for the pinned
       ``lb == ub`` case both branches agree, Cauchy.h:113-114);
    3. refine the free coordinates with the unconstrained df64
       pair-space polish of a masked objective (active coordinates
       frozen: their pair-gradient is zero, so they cannot move);
    4. project the result into the box and accept it only where the
       df64-evaluated objective did not worsen (misclassification
       safety: a wrongly-pinned coordinate can only lose by the fx
       test, in which case the original iterate is kept).

    Free coordinates strictly inside the box are refined exactly like
    the unconstrained polish; a fully-active optimum (every coordinate
    pinned) resolves in one step to the exact bound vector.

    ``prior``: the preceding BOX solve's :class:`SolveResult` (whose
    ``x`` is being polished).  When given, the returned counters are
    CUMULATIVE (``niter``/``nfev`` summed over both phases) and the box
    solve's termination ``status`` and ``history`` stay authoritative —
    the polish is an inner unconstrained refinement whose own status is
    not box-meaningful.  Without it, ``niter``/``nfev``/``status``
    describe the polish phase only.
    """
    from .utils import doublefloat as dfl

    fg = make_fun_and_grad(fun, fun_and_grad)
    lb = jnp.broadcast_to(jnp.asarray(lb, x0.dtype), x0.shape)
    ub = jnp.broadcast_to(jnp.asarray(ub, x0.dtype), x0.shape)
    fx0, g0 = fg(x0)
    act_lo = (x0 - lb <= active_tol) & (g0 >= 0.0)
    act_hi = (ub - x0 <= active_tol) & (g0 <= 0.0) & ~act_lo
    active = act_lo | act_hi
    xpin = jnp.where(act_lo, lb, jnp.where(act_hi, ub, x0))

    def raw_masked(z):
        fx, _ = fg(jnp.where(active, xpin, z))
        return fx

    # Subtract the df64 objective value at the start point INSIDE the
    # polished objective, as a two-word (hi, lo) constant pair: the
    # refinement's decrease (~1e-5 scale) would otherwise vanish under
    # the f32 rounding of a large absolute objective value (ulp(360) ~
    # 3e-5) when the pair interpreter emits its float result — the exact
    # wall this polish exists to break.  In the df64 interpretation the
    # two subtractions are exact, so the solver line-searches on the
    # full-resolution df64 decrease.
    ref = dfl.df64ify(raw_masked, to_native=False)(xpin)
    chi = jax.lax.stop_gradient(ref.hi)
    clo = jax.lax.stop_gradient(ref.lo)

    def masked_fun(z):
        return (raw_masked(z) - chi) - clo

    pol = polish_solve(masked_fun, xpin, params, iters,
                       line_search=line_search, direction=direction)
    xp = jnp.minimum(jnp.maximum(pol.x, lb), ub)
    fxp, gp = fg(xp)
    # Acceptance must also compare at df64 resolution (the improvement is
    # sub-ulp in plain f32): evaluate the same shifted objective at both
    # iterates in df64 — the shifted values are small, so their f32
    # rounding preserves the comparison.
    shifted = dfl.df64ify(lambda z: (fg(z)[0] - chi) - clo)
    better = shifted(xp) <= shifted(x0)
    x = jnp.where(better, xp, x0)
    fx = jnp.where(better, fxp, fx0)
    grad = jnp.where(better, gp, g0)
    pgnorm = jnp.max(jnp.abs(
        jnp.minimum(jnp.maximum(x - grad, lb), ub) - x))
    # nfev: the inner polish's count + this wrapper's five evaluations
    # (fg(x0), the df64 reference at xpin, the two shifted df64
    # acceptance evals, fg(xp)).
    if prior is not None:
        return SolveResult(x=x, fx=fx, grad=grad, gnorm=pgnorm,
                           niter=prior.niter + pol.niter,
                           nfev=prior.nfev + pol.nfev + 5,
                           status=prior.status, history=prior.history)
    return SolveResult(x=x, fx=fx, grad=grad, gnorm=pgnorm,
                       niter=pol.niter, nfev=pol.nfev + 5,
                       status=pol.status, history=pol.history)


def polish_solve_owlqn(fun: Optional[Callable], x0: Array,
                       l1, params: LBFGSParams, iters: int,
                       *,
                       fun_and_grad=None,
                       line_search: str = "morethuente",
                       direction: str = "sweeps",
                       on_ls_fail: str = "stop",
                       restarts: int = 1,
                       prior: Optional[SolveResult] = None) -> SolveResult:
    """Active-orthant df64 polish for L1-regularized (OWL-QN) solutions.

    The L1 analog of :func:`polish_solve_b` (round 5).  An f32 OWL-QN
    solve (:func:`~.owlqn.minimize_owlqn`) terminates at the f32
    objective plateau like every other solver — and since its ``f*`` is
    generally nonzero, the pseudo-gradient stalls at
    ``~sqrt(L * ulp(f*))``.  On the converged SUPPORT the composite
    objective is SMOOTH (``loss + sum lam_i sign(x_i) x_i`` on the
    fixed orthant), so the classic post-identification polish applies:

    1. coordinates at EXACT zero (OWL-QN's projection produces them)
       with ``|g_i| <= lam_i`` are KKT-consistent zeros — pin them;
    2. nonzero coordinates keep their orthant ``s_i = sign(x_i)`` and
       refine on the smooth restriction
       ``z -> loss(where(free, z, 0)) + sum_free lam_i s_i z_i``
       with the shifted df64 pair polish (the shift makes sub-ulp(f*)
       decreases visible — the round-5 f* != 0 rule);
    3. the refined point is projected back onto the orthant
       (sign-flipped coordinates clamp to exact 0) and accepted only
       if the df64-evaluated FULL L1 objective did not worsen
       (misclassification safety: a wrongly-pinned zero or wrong
       orthant can only lose by the test, keeping the OWL-QN iterate).

    Returns ``gnorm`` as the pseudo-gradient infinity norm (the KKT
    residual).  ``prior`` as in :func:`polish_solve_b`: cumulative
    counters, the OWL-QN solve's status/history authoritative.
    """
    from .utils import doublefloat as dfl
    from .owlqn import pseudo_gradient

    fg = make_fun_and_grad(fun, fun_and_grad)
    x0 = jnp.asarray(x0)
    lam = jnp.broadcast_to(jnp.asarray(l1, x0.dtype), x0.shape)
    fx0_loss, g0 = fg(x0)
    fx0 = fx0_loss + jnp.sum(lam * jnp.abs(x0))
    zero = x0 == 0.0
    pinned = zero & (jnp.abs(g0) <= lam)     # KKT-consistent exact zeros
    # Orthant per coordinate: nonzeros keep sign(x0); zeros that are NOT
    # KKT-consistent (|g0| > lam — the f32 solve parked them at 0 with
    # first-order decrease still available) get the DESCENT orthant from
    # the pseudo-gradient (pg > 0 -> f decreases into x < 0).  sign(0)=0
    # would otherwise zero their L1 term in the masked objective and the
    # full-L1 acceptance test would reject the whole instance's
    # refinement (round-5 review finding).
    pg0 = pseudo_gradient(x0, g0, lam)
    sgn = jnp.where(zero, -jnp.sign(pg0), jnp.sign(x0))

    def raw_masked(z):
        xz = jnp.where(pinned, 0.0, z)
        loss, _ = fg(xz)
        return loss + jnp.sum(jnp.where(pinned, 0.0, lam * sgn * z))

    ref = dfl.df64ify(raw_masked, to_native=False)(x0)
    chi = jax.lax.stop_gradient(ref.hi)
    clo = jax.lax.stop_gradient(ref.lo)

    def masked_fun(z):
        return (raw_masked(z) - chi) - clo

    pol = polish_solve(masked_fun, x0, params, iters,
                       line_search=line_search, direction=direction,
                       on_ls_fail=on_ls_fail, restarts=restarts)
    # orthant projection: coordinates that crossed zero clamp to EXACT 0
    xp = jnp.where(pinned | (sgn * pol.x < 0.0), 0.0, pol.x)

    def full_l1(z):
        loss, _ = fg(z)
        return loss + jnp.sum(lam * jnp.abs(z))

    shifted = dfl.df64ify(lambda z: (full_l1(z) - chi) - clo)
    better = shifted(xp) <= shifted(x0)
    x = jnp.where(better, xp, x0)
    loss_x, gx = fg(x)
    fx = jnp.where(better, loss_x + jnp.sum(lam * jnp.abs(x)), fx0)
    grad = jnp.where(better, gx, g0)
    pg = pseudo_gradient(x, grad, lam)
    pgnorm = jnp.max(jnp.abs(pg))
    # nfev: inner polish + fg(x0), the df64 reference, two shifted df64
    # acceptance evals, fg(x).
    if prior is not None:
        return SolveResult(x=x, fx=fx, grad=grad, gnorm=pgnorm,
                           niter=prior.niter + pol.niter,
                           nfev=prior.nfev + pol.nfev + 5,
                           status=prior.status, history=prior.history)
    return SolveResult(x=x, fx=fx, grad=grad, gnorm=pgnorm,
                       niter=pol.niter, nfev=pol.nfev + 5,
                       status=pol.status, history=pol.history)


def deep_polish(fun: Optional[Callable], res: SolveResult,
                params: LBFGSParams, k_deep: int, deep_iters: int,
                *,
                fun_and_grad=None,
                line_search: str = "morethuente",
                direction: str = "sweeps",
                selection: str = "gnorm",
                shift: bool = False,
                on_ls_fail: str = "stop",
                restarts: int = 1) -> SolveResult:
    """Straggler-targeted deep df64 refinement of a batched result.

    The reference's own multistart acceptance bar is *every-run*:
    ``max|x_i - 1| <= 1e-4`` on each of 1024 random starts
    (example-rosenbrock-bracketing.cpp:50-54).  A two-phase f32+polish
    batch run leaves a ~0.05% tail of instances short of that criterion
    (the polish budget is tuned for the 99.9%); this stage gives ONLY
    the hardest ``k_deep`` instances a deep df64 budget.  Worst-case
    cost ~= ``(k_deep / batch) * deep_iters`` iterations-equivalent —
    negligible for k_deep <= 0.5% of the batch, and still cheap at the
    SHIPPED operating point k_deep = 3*batch/16 (~19% of the batch):
    measured ~7% of headline throughput (PERF.md round-4), because the
    deep stage is a terminating while-loop and most selected instances
    converge in a few df64 iterations — the large k buys tail COVERAGE
    (near-criterion stragglers sit at selection ranks ~600-700 at batch
    4096), not proportional cost.

    Selection is in-band (no oracle).  ``selection="gnorm"`` (default):
    instances that did not converge (iteration cap or line-search
    failure) rank first, then by gradient norm descending; NaN gradient
    norms rank as worst.  ``selection="hstep"`` ranks by the
    quasi-Newton step length ``||H g||`` computed from each instance's
    carried curvature history — the Newton ESTIMATE OF DISTANCE TO THE
    OPTIMUM, which separates criterion failures from merely-slow
    instances far better than the raw gradient norm when the
    gradient-norm distribution is wide (e.g. a trial-capped cheap main
    phase; measured on chip, PERF.md round-4).  The selected
    instances are re-polished from their current iterate with a COLD
    df64 restart (:func:`polish_solve` — their previous history stalled
    at the criterion, the regime where rebuilding curvature from clean
    df64 measurements wins; see the regime boundary note there) and the
    refined fields are scattered back.  The deep phase is a terminating
    while-loop over ``k_deep`` instances, so its wall time is bounded by
    the slowest straggler, not the cap.  One [k, n] gather + one
    scatter per solve — not per iteration.

    The returned ``history`` is the main phase's, with the refined
    slots SOFT-RESET (``ncorr = 0``, ``theta = 1`` — the same validity
    masking as ``on_ls_fail="restart"``): the deep stage's curvature
    lives in pair space and does not transfer, so the pre-refinement
    model no longer corresponds to the refined iterate; the reset makes
    the stale model unreachable (Hessian accessors on refined slots
    give ``theta * I``) instead of silently wrong for a subsequent
    ``warm_history`` polish or ``hstep`` selection.
    """
    if selection not in ("gnorm", "hstep"):
        raise ValueError(f"selection must be 'gnorm' or 'hstep', "
                         f"got {selection!r}")
    batch = jnp.shape(res.gnorm)[0]
    if selection == "hstep":
        from .ops import history as hist_ops
        tri = direction if direction == "rinv" else "sweeps"
        est = jax.vmap(lambda h, g: jnp.linalg.norm(
            hist_ops.apply_hv(h, g, -1.0, tri=tri)))(res.history, res.grad)
        est = jnp.where(jnp.isnan(est), jnp.inf,
                        jnp.asarray(est, jnp.float32))
        order = jnp.argsort(-est)                  # largest ||H g|| first
    else:
        gn = jnp.asarray(res.gnorm, jnp.float32)
        gn = jnp.where(jnp.isnan(gn), jnp.inf, gn)
        unconv = (res.status == jnp.int32(Status.MAX_ITERATIONS)) | \
            (res.status >= jnp.int32(10))
        # Integer composite rank (no float-precision tie collapse):
        # primary = unconverged-before-converged, secondary = gradient
        # norm descending.
        rank = jnp.argsort(jnp.argsort(-gn))       # 0 = largest gnorm
        order = jnp.argsort(jnp.where(unconv, rank, rank + batch))
    idx = order[:k_deep]

    pol = jax.vmap(lambda x0: polish_solve(
        fun, x0, params, deep_iters, fun_and_grad=fun_and_grad,
        line_search=line_search, direction=direction,
        shift=shift, on_ls_fail=on_ls_fail,
        restarts=restarts))(res.x[idx])

    def scat(a, b):
        return a.at[idx].set(b)

    hist = res.history._replace(
        ncorr=res.history.ncorr.at[idx].set(0),
        theta=res.history.theta.at[idx].set(
            jnp.ones((), res.history.theta.dtype)))
    return SolveResult(
        x=scat(res.x, pol.x), fx=scat(res.fx, pol.fx),
        grad=scat(res.grad, pol.grad), gnorm=scat(res.gnorm, pol.gnorm),
        niter=scat(res.niter, res.niter[idx] + pol.niter),
        nfev=scat(res.nfev, res.nfev[idx] + pol.nfev),
        status=scat(res.status, pol.status),
        history=hist)


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
                     polish_iters: int = 0,
                     polish_params: Optional[LBFGSParams] = None,
                     refine_frac: float = 0.0,
                     refine_iters: int = 0,
                     drive: str = "while",
                     direction: str = "sweeps",
                     polish_warm: bool = False,
                     polish_shift: bool = False,
                     polish_on_ls_fail: str = "stop",
                     polish_restarts: int = 1,
                     deep_frac: float = 0.0,
                     deep_iters: int = 0,
                     deep_selection: str = "gnorm",
                     on_ls_fail: str = "stop") -> SolveResult:
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
    solution quality at a few extra iterations' cost.  ``polish_warm=True``
    hands each instance's main-phase curvature history to the polish
    (lifted into pair space, see :func:`_lift_history_pairs`), so the
    polish starts from a full quasi-Newton model and the same quality
    needs fewer ``polish_iters`` — use it for endgame refinement
    (iteration-capped throughput batches, the bench regime); keep the
    cold restart when instances stall at the f32 wall far from the
    criterion (see :func:`polish_solve` for the measured boundary).

    ``drive="fixed"`` replaces the termination-tested ``lax.while_loop``
    with a static ``params.max_iterations``-trip ``lax.fori_loop`` of
    frozen-masked steps (:func:`~.lbfgs.Solver` ``run_fixed``) — results
    are bit-identical (finished instances freeze), but the loop has no
    per-iteration all-done cond reduction.  Worth it when most of the
    batch runs to the cap anyway (the headline bench regime); wasteful
    when the batch converges long before the cap.  Requires a finite
    ``params.max_iterations``; the polish phase (fixed 12 iterations by
    construction) always profits.

    ``polish_params`` supplies a SEPARATE parameter set for the df64
    polish/deep phases (default: the main ``params``) — required to
    reproduce the bench headline through this API, whose main phase is
    trial-capped (``max_linesearch=2`` + ``on_ls_fail="restart"``)
    while the refinement phases keep the reference's full budgets.

    **Transferring the bench recipe to other objective families**
    (measured round-5, PERF.md "Does the recipe transfer"): the phase
    STRUCTURE transfers, but two family-dependent rules must be applied.
    (1) *Certificate scaling*: the polish/deep gnorm exit certifies the
    x-criterion through the optimum's smallest Hessian eigenvalue —
    set ``polish_params.epsilon ~ 0.1 * lambda_min * tol_x`` and
    ``epsilon_rel=0`` (the default ``epsilon_rel=1e-5`` otherwise
    re-loosens the exit for ``||x*|| >> 1``).  (2) *fx-resolution
    shift*: when ``f* != 0``, pass ``polish_shift=True`` — without it
    both the f32 main phase AND the pair-space polish stall at
    ``||g|| ~ sqrt(L * ulp(f*))`` because sub-ulp decreases are
    invisible to the line search; the Rosenbrock bench never sees this
    because its ``f* = 0``.

    ``deep_frac``/``deep_iters`` enable straggler-targeted deep
    refinement (:func:`deep_polish`) AFTER the polish phase: the hardest
    ``deep_frac`` of instances (unconverged first, then by gradient
    norm) get up to ``deep_iters`` extra cold-restart df64 iterations.
    This is how the reference's *every-run* acceptance bar
    (example-rosenbrock-bracketing.cpp:50-54) is met on f32 hardware at
    batch throughput: the polish budget serves the 99.9%, the deep stage
    the remaining handful at ~``deep_frac * deep_iters`` amortized cost.

    ``refine_frac``/``refine_iters`` enable straggler compaction
    (:func:`_compact_refine`): the batch runs in lockstep only to
    ``params.max_iterations``, then the hardest ``refine_frac`` of
    instances continue alone for up to ``refine_iters`` more iterations.
    When every unconverged instance fits in the refined fraction this is
    bit-identical to a single run with the summed cap, at a fraction of
    the lockstep wall time (the easy ~75-90% of the batch stops paying
    frozen-carry iterations for the hard tail).  Requires a finite
    ``params.max_iterations``; under ``mesh`` the compaction permutation
    becomes a cross-device resharding of the carry (still once per solve,
    not per iteration).
    """
    use_refine = refine_frac > 0.0 and refine_iters > 0
    x0s = jnp.asarray(x0s)
    if drive not in ("while", "fixed"):
        raise ValueError(f"drive must be 'while' or 'fixed', got {drive!r}")
    if drive == "fixed":
        if params.max_iterations == 0:
            raise ValueError("drive='fixed' requires a finite "
                             "params.max_iterations (the static trip count)")
        if use_refine:
            raise ValueError("drive='fixed' does not compose with straggler "
                             "compaction (whose stages are while-driven)")

    use_deep = deep_frac > 0.0 and deep_iters > 0
    # The df64 polish/deep phases take their own parameter set: a
    # trial-capped / restart-mode main phase (the bench headline recipe)
    # must NOT cap the refinement phases — pass polish_params with the
    # full reference budgets there.  Default: the main params.
    pparams = params if polish_params is None else polish_params

    def polish_batch(res):
        if polish_warm:
            pol = jax.vmap(lambda xf, h: polish_solve(
                fun, xf, pparams, polish_iters, fun_and_grad=fun_and_grad,
                line_search=line_search, drive=drive,
                direction=direction, warm_history=h,
                shift=polish_shift,
                on_ls_fail=polish_on_ls_fail,
                restarts=polish_restarts))(res.x, res.history)
        else:
            pol = jax.vmap(lambda xf: polish_solve(
                fun, xf, pparams, polish_iters, fun_and_grad=fun_and_grad,
                line_search=line_search, drive=drive,
                direction=direction, shift=polish_shift,
                on_ls_fail=polish_on_ls_fail,
                restarts=polish_restarts))(res.x)
        return _merge_polished(res, pol)

    def post(res):
        if polish_iters:
            res = polish_batch(res)
        if use_deep:
            batch = res.x.shape[0]
            k_deep = max(1, min(batch, int(round(deep_frac * batch))))
            res = deep_polish(fun, res, pparams, k_deep, deep_iters,
                              fun_and_grad=fun_and_grad,
                              line_search=line_search, direction=direction,
                              selection=deep_selection, shift=polish_shift,
                              on_ls_fail=polish_on_ls_fail,
                              restarts=polish_restarts)
        return res

    if use_refine:
        if params.max_iterations == 0:
            raise ValueError(
                "refine_iters requires a finite params.max_iterations "
                "(the stage-1 lockstep cap)")
        batch = x0s.shape[0]
        k_refine = max(1, min(batch, int(round(refine_frac * batch))))
        p2 = dataclasses.replace(
            params, max_iterations=params.max_iterations + refine_iters)
        s2 = lbfgs.solver(fun, p2, fun_and_grad=fun_and_grad,
                          line_search=line_search, direction=direction,
                          on_ls_fail=on_ls_fail)

        def f(xs):
            res = jax.vmap(s2.finalize)(_compact_refine(
                s2, xs, k_refine, params.max_iterations))
            return post(res)
    else:
        s1 = lbfgs.solver(fun, params, fun_and_grad=fun_and_grad,
                          line_search=line_search, direction=direction,
                          on_ls_fail=on_ls_fail)

        def solve_one(x0):
            st = s1.init(x0)
            st = (s1.run_fixed(st, params.max_iterations)
                  if drive == "fixed" else s1.run(st))
            return s1.finalize(st)

        def f(xs):
            res = jax.vmap(solve_one)(xs)
            return post(res)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(batch_axis))
        x0s = jax.device_put(x0s, sh)
        f = jax.jit(f)
    elif jit:
        f = jax.jit(f)
    return f(x0s)


def best_result(results: SolveResult,
                prefer_success: bool = True) -> SolveResult:
    """Select the single best instance from a batched :class:`SolveResult`
    — the multistart reduction (the reference's examples run N random
    starts and keep checking each one,
    example-rosenbrock-bracketing.cpp:44-55; here: one vmap + this).

    Picks the instance with the lowest ``fx``; with ``prefer_success``
    (default) instances whose status is in :data:`~.types.SUCCESS_STATUSES`
    outrank failed ones regardless of their fx (a diverged instance can
    report a spuriously low objective through a NaN/overflow region).
    Works under ``jit``; NaN fx values always lose.
    """
    fx = results.fx
    bad = jnp.isnan(fx)
    if prefer_success:
        ok = jnp.isin(results.status,
                      jnp.asarray([int(s) for s in SUCCESS_STATUSES]))
        bad = bad | ~ok
    keyed = jnp.where(bad, jnp.inf, fx)
    # all-failed batch: fall back to plain fx so argmin stays meaningful
    keyed = jnp.where(jnp.all(bad), jnp.where(jnp.isnan(fx), jnp.inf, fx),
                      keyed)
    i = jnp.argmin(keyed)
    return jax.tree.map(lambda a: a[i], results)


def minimize_b_batched(fun: Optional[Callable] = None,
                       x0s: Array = None,
                       lb: Array = None,
                       ub: Array = None,
                       params: LBFGSBParams = LBFGSBParams(),
                       *,
                       fun_and_grad=None,
                       line_search: str = "morethuente",
                       jit: bool = True,
                       mesh=None,
                       batch_axis: str = "batch",
                       gcp: str = "auto",
                       unroll_subspace: bool = False,
                       drive: str = "while",
                       middle_solve=None,
                       polish_iters: int = 0,
                       polish_active_tol: float = 1e-3) -> SolveResult:
    """Box-constrained batch solve; ``lb``/``ub`` are shared [n] bounds or
    per-instance [B, n].

    ``polish_iters > 0`` appends the active-set df64 polish
    (:func:`polish_solve_b`) per instance: KKT-consistent bound-active
    coordinates pin exactly to their bounds and free coordinates refine
    in df64 pair space — on f32 hardware this closes the f32 objective
    plateau where the past/delta test fires with coordinates still
    ~1e-4 off their bounds (the bench's box quality stage; PERF.md
    round-4).  ``polish_active_tol`` is the bound-activity
    classification tolerance (misclassification is safe: the df64
    acceptance gate keeps the original iterate if pinning loses).

    ``gcp="auto"`` picks the batched fast path — the prefix-sum GCP
    (all-parallel, no per-breakpoint scan; under ``vmap`` the sequential
    walk of the reference formulation serializes the whole batch at each
    tiny step) — for n <= 2048 (its per-instance memory is O(n m) since
    the cumsum rewrite; only the rank/permutation matmul FLOPs grow as
    O(n^2)), and the memory-lean sequential scan for larger n.
    Measured on TPU (batch 1024, Rosenbrock n=10): prefix GCP 13.5k
    solves/s vs 1.5k for the scan walk; the statically-unrolled BOXCQP
    (``unroll_subspace=True``) measured *slower* (6.4k — it always pays
    all ``max_submin`` iterations, while the while_loop exits after the
    1-2 a typical subspace solve needs), so it stays off by default.
    Pass ``gcp="scan"`` for the bit-exact reference-order path at any
    size, or ``gcp="prefix"`` to force the fast path (reassociated sums,
    identical index sets).  ``drive="fixed"`` as in
    :func:`minimize_batched` (note the judged box configs typically
    converge far before the cap, where the default while-drive wins).
    ``mesh`` (a 1-D `jax.sharding.Mesh`) scales the batch data-parallel
    across chips with zero collectives, as in :func:`minimize_batched`;
    per-instance ``[B, n]`` bounds shard with the batch, shared ``[n]``
    bounds replicate."""
    x0s = jnp.asarray(x0s)
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    per_instance = lb.ndim == 2
    if drive not in ("while", "fixed"):
        raise ValueError(f"drive must be 'while' or 'fixed', got {drive!r}")
    if drive == "fixed" and params.max_iterations == 0:
        raise ValueError("drive='fixed' requires a finite "
                         "params.max_iterations (the static trip count)")
    if gcp == "auto":
        # The prefix GCP's per-instance memory is O(n m) (chunked rank /
        # permutation tiles, cumulative sums — no O(n^2) intermediates
        # since the cumsum rewrite), so the fast path now covers the
        # whole batched regime up to n ~ 2048 (measured on v5e: 3.2x the
        # lockstep scan at n=256, 2.8x at n=1024; PERF.md table); beyond
        # that the rank/permutation matmul FLOPs (O(n^2) per instance)
        # start to dominate and the memory-lean sequential scan takes
        # over.
        gcp = "prefix" if x0s.shape[-1] <= 2048 else "scan"

    def solve_one(x0, lbi, ubi):
        s = lbfgsb.solver(fun, lbi, ubi, params,
                          fun_and_grad=fun_and_grad,
                          line_search=line_search, gcp=gcp,
                          unroll_subspace=unroll_subspace,
                          middle_solve=middle_solve)
        st = s.init(x0)
        st = (s.run_fixed(st, params.max_iterations)
              if drive == "fixed" else s.run(st))
        res = s.finalize(st)
        if polish_iters:
            pparams = LBFGSParams(
                epsilon=min(params.epsilon, 1e-7),
                max_iterations=max(params.max_iterations, 60),
                m=params.m)
            # prior=res: iterates from the polish, counters cumulative,
            # the BOX solve's termination status and matrix state stay
            # authoritative (see polish_solve_b).
            res = polish_solve_b(fun, res.x, lbi, ubi, pparams,
                                 polish_iters, fun_and_grad=fun_and_grad,
                                 active_tol=polish_active_tol, prior=res)
        return res

    in_axes = (0, 0, 0) if per_instance else (0, None, None)
    f = jax.vmap(solve_one, in_axes=in_axes)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(batch_axis))
        x0s = jax.device_put(x0s, sh)
        if per_instance:
            lb = jax.device_put(lb, sh)
            ub = jax.device_put(ub, sh)
        f = jax.jit(f)
    elif jit:
        f = jax.jit(f)
    return f(x0s, lb, ub)
