"""Generalized Cauchy point (GCP) as a fixed-shape sort + scan.

TPU-native re-design of the reference's ``Cauchy`` class
(/root/reference/include/LBFGSpp/Cauchy.h:86-284).  The reference walks a
sorted list of per-coordinate break points with a data-dependent trip count
and dynamic index sets; here the walk is a ``lax.scan`` over all n sorted
coordinates with a ``stopped`` flag, and the index sets become boolean masks:

* break points ``brk`` and the search direction ``vecd = -g`` (zeroed on
  boundary coordinates) are built exactly as Cauchy.h:111-129, including the
  pinned-variable rule ``lb == ub -> brk = 0``;
* ``jnp.argsort`` replaces ``std::sort`` (participating coordinates keyed by
  ``brk``, everyone else pushed to +inf) and the scan inputs — gradient,
  bound gap, W rows — are pre-gathered in sorted order so each scan step is
  O(m) work with no dynamic indexing;
* the reference processes all coordinates sharing one break point as a group
  (Cauchy.h:193-256); the scan processes them one at a time, which is
  algebraically identical because tie members see ``deltat == 0`` — the
  stop test ``deltatmin < deltat`` is evaluated only on the first member of
  each group (``deltat > 0``), matching the grouped while-condition;
* per-coordinate state that the reference mutates in place (``xcp``,
  ``vecd``) is reconstructed after the scan from the emitted ``crossed``
  flags, keeping the scan carry at O(m) instead of O(n).

The ``fpp < eps`` rescue (Cauchy.h:258-262) and the final free-variable
extension (Cauchy.h:264-282) are applied after the scan.

Outputs: ``xcp``, ``vecc = W'(xcp - x0)`` in slot layout, the new-active
mask and the free-variable mask (coordinates on the boundary from the start
belong to neither, as in the reference).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from . import bmat

Array = jax.Array


class CauchyResult(NamedTuple):
    """GCP output contract (``Cauchy::get_cauchy_point`` out-params
    ``xcp``/``vecc``/``newact_set``/``fv_set``, Cauchy.h:86-88), with the
    reference's dynamic index sets as boolean masks."""

    xcp: Array         # [n] generalized Cauchy point
    vecc: Array        # [2m] c = W'(xcp - x0), slot layout
    newact_mask: Array  # [n] coordinates that became active during the walk
    free_mask: Array   # [n] free-variable set


def _break_points(x0: Array, g: Array, lb: Array, ub: Array):
    """Per-coordinate break points, initial direction and participation
    masks (Cauchy.h:111-129), including the pinned-variable rule
    ``lb == ub -> brk = 0`` (Cauchy.h:113-114).  Shared by all three GCP
    formulations so the parity-sensitive rules live in exactly one place.
    """
    dtype = x0.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    pinned = lb == ub
    brk = jnp.where(
        pinned, 0.0,
        jnp.where(g < 0.0, (x0 - ub) / g,
                  jnp.where(g > 0.0, (x0 - lb) / g, inf)))
    iszero = brk == 0.0
    vecd = jnp.where(iszero, 0.0, -g)
    free0 = brk == inf
    participates = (~free0) & (~iszero)
    return brk, vecd, free0, participates


def _finish(x0: Array, vecd: Array, lb: Array, ub: Array,
            free0: Array, participates: Array, crossed: Array,
            crossed_all: Array, t_last: Array, fp: Array, fpp: Array,
            vecc_l: Array, vecp_l: Array) -> CauchyResult:
    """Shared epilogue: the ``fpp ~ 0`` rescue (Cauchy.h:258-262) and the
    final free-variable extension (Cauchy.h:264-282)."""
    eps = jnp.finfo(x0.dtype).eps
    deltatmin = jnp.where(fpp < eps, -fp / eps, -fp / fpp)
    deltatmin = jnp.maximum(deltatmin, 0.0)
    tfinal = t_last + deltatmin

    vecc = jnp.where(crossed_all, vecc_l, vecc_l + deltatmin * vecp_l)
    free_mask = free0 | (participates & (~crossed))
    xcp = jnp.where(crossed, jnp.where(vecd > 0.0, ub, lb), x0)
    extend = free_mask & (~crossed_all)
    xcp = jnp.where(extend, x0 + tfinal * vecd, xcp)

    return CauchyResult(xcp=xcp, vecc=vecc, newact_mask=crossed,
                        free_mask=free_mask)


class _ScanCarry(NamedTuple):
    vecc: Array      # [2m]
    vecp: Array      # [2m]
    fp: Array
    fpp: Array
    il: Array
    stopped: Array


def cauchy_point(bh: bmat.BHistory, x0: Array, g: Array,
                 lb: Array, ub: Array,
                 axis_name: Optional[str] = None) -> CauchyResult:
    """Compute the GCP (Cauchy::get_cauchy_point, Cauchy.h:86-284).

    ``axis_name`` is accepted for signature uniformity; the sort-based walk
    requires the full vector on each device, so the box-constrained path is
    replicated/batched (the sharded feature axis serves the unconstrained
    solver; see SURVEY.md §2).
    """
    del axis_name
    n = x0.shape[0]
    m = bh.m
    dtype = x0.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    theta = bh.theta

    brk, vecd, free0, participates = _break_points(x0, g, lb, ub)
    nord = jnp.sum(participates)

    # --- Sort participating coordinates by break point (Cauchy.h:131-133) ---
    key = jnp.where(participates, brk, inf)
    order = jnp.argsort(key)               # stable: ties keep coord order
    brk_o = key[order]
    g_o = g[order]
    bound_o = jnp.where(vecd > 0.0, ub, lb)[order]
    z_o = bound_o - x0[order]              # z = xcp[act] - x0[act]
    w_o = bmat.w_columns(bh, order)        # [n, 2m] rows of W, sorted
    valid_o = jnp.arange(n) < nord

    # --- Initial fp / fpp (Cauchy.h:150-161) ---
    vecp = bmat.apply_wtv(bh, vecd)
    fp = -coll.psqnorm(vecd)
    mp = bmat.apply_mv(bh, vecp)
    fpp = -theta * fp - vecp @ mp

    mdense = bh.mdense

    def step(c: _ScanCarry, xs):
        brk_t, g_t, z_t, w_t, valid_t = xs
        deltat = brk_t - c.il
        deltatmin = -c.fp / c.fpp
        first_of_group = deltat > 0.0
        stop_now = valid_t & (~c.stopped) & first_of_group & \
            (deltatmin < deltat)
        cross = valid_t & (~c.stopped) & (~stop_now)

        # Masking must SELECT, not multiply: the sorted tail rows carry
        # brk_t (hence deltat) and z_t = +-inf, and 0 * inf = NaN — a
        # mask-multiply only survives when XLA's simplifier happens to
        # rewrite convert(pred)*x into a select.
        dt_c = jnp.where(cross, deltat, 0.0)
        vecc = c.vecc + dt_c * c.vecp
        fp = c.fp + dt_c * c.fpp

        # Per-coordinate updates (Cauchy.h:219-234)
        cache = mdense @ w_t               # M w
        gg = g_t * g_t
        fp = fp + jnp.where(
            cross, gg + theta * g_t * z_t - g_t * (cache @ vecc), 0.0)
        fpp = c.fpp - jnp.where(
            cross, theta * gg + 2.0 * g_t * (cache @ c.vecp) +
            gg * (cache @ w_t), 0.0)
        vecp = c.vecp + jnp.where(cross, g_t, 0.0) * w_t
        il = jnp.where(cross, brk_t, c.il)
        stopped = c.stopped | stop_now
        return _ScanCarry(vecc, vecp, fp, fpp, il, stopped), cross

    init = _ScanCarry(
        vecc=jnp.zeros((2 * m,), dtype), vecp=vecp, fp=fp, fpp=fpp,
        il=jnp.zeros((), dtype), stopped=jnp.zeros((), bool))
    out, crossed_o = lax.scan(step, init,
                              (brk_o, g_o, z_o, w_o, valid_o))

    # Scatter the crossed flags back to coordinate order.
    crossed = jnp.zeros((n,), bool).at[order].set(crossed_o)
    ncrossed = jnp.sum(crossed)
    nfree0 = jnp.sum(free0)
    crossed_all = (nfree0 == 0) & (ncrossed == nord)

    return _finish(x0, vecd, lb, ub, free0, participates, crossed,
                   crossed_all, out.il, out.fp, out.fpp, out.vecc, out.vecp)


# Target element count for the [chunk, n] one-hot / comparison tiles in
# cauchy_point_prefix: bounds its peak temporary to O(PERM_TILE) per
# instance instead of O(n^2) (chunk = PERM_TILE / n rows at a time).
_PERM_TILE = 16384


def cauchy_point_prefix(bh: bmat.BHistory, x0: Array, g: Array,
                        lb: Array, ub: Array,
                        axis_name: Optional[str] = None,
                        perm: str = "onehot") -> CauchyResult:
    """GCP with the interval walk re-expressed as *parallel prefix sums* —
    the batch-mode fast path (same math as :func:`cauchy_point`, no
    sequential scan).

    The reference walk (Cauchy.h:183-256) updates ``(vecc, vecp, fp, fpp)``
    coordinate by coordinate in sorted break-point order.  Each update is
    affine in the running state, so the entire no-stop trajectory has a
    closed form in terms of prefix sums over the sorted coordinates:

        P_j   = vecp0 + sum_{k<=j} g_k w_k
        C_j   = T_j vecp0 + sum_{k<j} g_k (T_j - T_k) w_k
        fpp_j = fpp0 - cumsum[ theta g_i^2 + 2 g_i (u_i . P_{i-1})
                               + g_i^2 (u_i . w_i) ]
        fp_j  = fp0 + cumsum[ dt_i fpp_{i-1} ]
                    + cumsum[ g_i^2 + theta g_i z_i - g_i (u_i . C_i) ]

    with ``u_i = M w_i``.  The pairwise terms collapse onto the [n, 2m]
    running sums ``cumP = cumsum(g_i w_i)`` / ``cumPT = cumsum(g_i t_i
    w_i)`` (``u_i . P_{i-1} = u_i . cumP_{i-1}`` etc.), so the state
    trajectory costs O(n m) — no O(n^2) matrix.  The stop condition is
    evaluated for all positions at once; the first position where it
    fires selects the prefix state, exactly as the sequential walk would.

    The only superlinear work left is the stable rank computation and the
    permutation into sorted order, done as comparison-counting and one-hot
    matmuls (batched gathers lower poorly on TPU) in [chunk, n] tiles
    (``_PERM_TILE``), keeping peak memory O(n) per instance at O(n^2 / c)
    matmul FLOPs — cheap MXU work even at n in the thousands.

    Summation order differs from the sequential walk by reassociation, so
    this path is opt-in (``gcp="prefix"``); ``tests/test_cauchy_prefix.py``
    checks it against the scan walk on randomized structural cases.

    ``perm`` selects how values reach sorted order: ``"onehot"`` (default)
    is the chunked comparison-count + one-hot-matmul form — no gathers, the
    right shape under ``vmap`` where batched gathers lower terribly on TPU,
    but O(n^2 / c) matmul FLOPs; ``"sort"`` uses ``argsort`` + row gathers
    (O(n log n)) — the large-n single-instance path, where an unbatched
    gather lowers fine (exposed as ``gcp="prefix_sorted"``).  Both produce
    identical sorted rows (stable ties), hence identical results.
    """
    del axis_name
    n = x0.shape[0]
    m = bh.m
    dtype = x0.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    theta = bh.theta
    hp = lax.Precision.HIGHEST

    brk, vecd, free0, participates = _break_points(x0, g, lb, ub)
    nord = jnp.sum(participates)

    key = jnp.where(participates, brk, inf)
    bound = jnp.where(vecd > 0.0, ub, lb)
    vals = jnp.concatenate([
        jnp.where(participates, brk, 0.0)[:, None],
        jnp.where(participates, g, 0.0)[:, None],
        jnp.where(participates, bound - x0, 0.0)[:, None],
        bmat.w_rows(bh)], axis=1)           # [n, 2m+3]

    if perm == "sort":
        # --- argsort + gather: O(n log n), single-instance large n ---
        order = jnp.argsort(key)            # stable: ties keep coord order
        vals_s = vals[order]
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        n_pad = n
        idx = jnp.arange(n)
    else:
        # --- Stable ranks by chunked comparison counting (no gathers) ---
        c = max(1, min(n, _PERM_TILE // max(n, 1)))
        n_pad = -(-n // c) * c
        pad = n_pad - n
        key_p = jnp.concatenate([key, jnp.full((pad,), inf, dtype)]) \
            if pad else key
        idx = jnp.arange(n_pad)

        def rank_chunk(args):
            kc, ic = args
            lt = key_p[None, :] < kc[:, None]
            tie = (key_p[None, :] == kc[:, None]) & \
                (idx[None, :] < ic[:, None])
            return jnp.sum(lt | tie, axis=1)

        rank_p = lax.map(rank_chunk, (key_p.reshape(-1, c),
                                      idx.reshape(-1, c))).reshape(n_pad)
        rank = rank_p[:n]                   # [n] coord -> sorted position

        # Sorted-order quantities via chunked one-hot matmuls: one
        # [n, 2m+3] value block permuted in [c, n] tiles.
        if pad:
            vals = jnp.concatenate(
                [vals, jnp.zeros((pad, vals.shape[1]), dtype)], axis=0)

        def perm_chunk(pc):
            oh = (rank_p[None, :] == pc[:, None]).astype(dtype)
            return jnp.einsum("cn,nk->ck", oh, vals, precision=hp)

        vals_s = lax.map(perm_chunk, idx.reshape(-1, c)).reshape(n_pad, -1)

    valid = idx < nord
    t_s = vals_s[:, 0]
    g_s = vals_s[:, 1]
    z_s = vals_s[:, 2]
    w_s = vals_s[:, 3:]                     # [n_pad, 2m]; rows at invalid
    # positions carry g_s = 0, so every use below vanishes there.

    # --- Initial fp / fpp (Cauchy.h:150-161) ---
    vecp0 = bmat.apply_wtv(bh, vecd)
    fp0 = -coll.psqnorm(vecd)
    fpp0 = -theta * fp0 - vecp0 @ bmat.apply_mv(bh, vecp0)

    mdense = bh.mdense
    u_s = jnp.einsum("sk,kl->sl", w_s, mdense, precision=hp)   # rows M w_i
    kdiag = jnp.sum(u_s * w_s, axis=1)                         # u_i . w_i

    gg = g_s * g_s
    gw = g_s[:, None] * w_s
    cum_p = jnp.cumsum(gw, axis=0)                             # sum_{t<=s}
    cum_p_prev = jnp.concatenate(
        [jnp.zeros((1, 2 * m), dtype), cum_p[:-1]], axis=0)
    cum_pt = jnp.cumsum(t_s[:, None] * gw, axis=0)
    cum_pt_prev = jnp.concatenate(
        [jnp.zeros((1, 2 * m), dtype), cum_pt[:-1]], axis=0)
    a_vec = jnp.sum(u_s * cum_p_prev, axis=1)   # u_i . sum_{t<i} g_t w_t
    b_vec = jnp.sum(u_s * cum_pt_prev, axis=1)  # u_i . sum_{t<i} g_t t_t w_t
    uv0 = u_s @ vecp0                                          # u_i . vecp0

    # fpp prefix
    dec = theta * gg + 2.0 * g_s * (uv0 + a_vec) + gg * kdiag
    fpp_pref = fpp0 - jnp.cumsum(dec)                          # fpp_j
    fpp_prev = jnp.concatenate([fpp0[None], fpp_pref[:-1]])    # fpp_{j-1}

    # fp prefix: segment advances + per-coordinate terms
    t_prev = jnp.concatenate([jnp.zeros((1,), dtype), t_s[:-1]])
    dt = jnp.where(valid, t_s - t_prev, 0.0)
    ucj = t_s * (uv0 + a_vec) - b_vec                          # u_i . C_i
    per = jnp.where(valid, gg + theta * g_s * z_s - g_s * ucj, 0.0)
    fp_pref = fp0 + jnp.cumsum(dt * fpp_prev) + jnp.cumsum(per)
    fp_prev = jnp.concatenate([fp0[None], fp_pref[:-1]])

    # --- Stop condition, evaluated everywhere at once ---
    deltatmin_prev = -fp_prev / fpp_prev
    stop = valid & (dt > 0.0) & (deltatmin_prev < dt)
    any_stop = jnp.any(stop)
    jstar = jnp.argmax(stop)                                   # first stop
    ncross = jnp.where(any_stop, jstar, nord)

    crossed = rank < ncross                 # coordinate order directly
    ncrossed = jnp.sum(crossed)
    nfree0 = jnp.sum(free0)
    crossed_all = (nfree0 == 0) & (ncrossed == nord)

    # State after the last crossed coordinate (index ncross - 1), selected
    # from the prefix arrays with one-hot dots.
    last = ncross - 1
    onehot_last = (idx == last).astype(dtype)
    fp = jnp.where(ncross == 0, fp0, onehot_last @ fp_pref)
    fpp = jnp.where(ncross == 0, fpp0, onehot_last @ fpp_pref)
    il = jnp.where(ncross == 0, jnp.zeros((), dtype), onehot_last @ t_s)
    cum_p_last = onehot_last @ cum_p        # sum_{t < ncross} g_t w_t
    cum_pt_last = onehot_last @ cum_pt
    vecp_l = vecp0 + cum_p_last
    vecc_l = il * vecp0 + il * cum_p_last - cum_pt_last

    return _finish(x0, vecd, lb, ub, free0, participates, crossed,
                   crossed_all, il, fp, fpp, vecc_l, vecp_l)


class _WalkCarry(NamedTuple):
    t: Array         # last crossed break-point value (il)
    fp: Array
    fpp: Array
    vecp: Array      # [2m]
    vecc: Array      # [2m]
    crossed: Array   # [n_local] bool
    stopped: Array
    rounds: Array    # int32, crossed groups so far (trip-count bound)


def cauchy_point_walk(bh: bmat.BHistory, x0: Array, g: Array,
                      lb: Array, ub: Array,
                      axis_name: Optional[str] = None) -> CauchyResult:
    """GCP as a *sortless segment walk* — the sharded implementation.

    The reference sorts all break points and walks them one coordinate at a
    time (Cauchy.h:131-256); neither the sort nor the per-coordinate state
    survives feature-sharding of ``x``.  This formulation never sorts:
    each round advances to the next break-point value ``t_next =
    pmin(remaining brk)`` and processes the whole tie group at once with
    order-independent closed forms (``M`` is symmetric, so the
    within-group cross terms collapse to ``G'MG`` with ``G = sum g_b
    w_b``):

        vecc += dt * vecp
        fp   += dt * fpp + sum(gg) + theta * sum(g z) - (M G) . vecc
        fpp  -= theta * sum(gg) + 2 (M G) . vecp + G' M G
        vecp += G

    Exactly 2 collectives per crossed group (one ``pmin`` for the next
    break point, one fused ``psum`` of ``[G; sum gg; sum gz]``), O(local)
    work per round — and the trip count is the number of *distinct
    crossed break points*, which the walk's early stop keeps small in
    practice (exhaustion is detected by ``pmin`` returning +inf, so no
    floating-point coordinate count is carried — exact at any n).  Group processing matches the reference semantics:
    tie members see ``deltat == 0`` and the stop test fires only on the
    first member (Cauchy.h:193-256).  Works unsharded too
    (``axis_name=None``) — used to cross-check against the sequential scan
    (tests/test_cauchy_walk.py).
    """
    n = x0.shape[0]
    m = bh.m
    dtype = x0.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    theta = bh.theta

    brk, vecd, free0, participates = _break_points(x0, g, lb, ub)
    nord = coll.psum_scalar(jnp.sum(participates.astype(jnp.int32)),
                            axis_name)

    # --- Initial fp / fpp (Cauchy.h:150-161) ---
    vecp0 = bmat.apply_wtv(bh, vecd, axis_name)
    fp0 = -coll.psqnorm(vecd, axis_name)
    fpp0 = -theta * fp0 - vecp0 @ bmat.apply_mv(bh, vecp0)

    mdense = bh.mdense
    bound = jnp.where(vecd > 0.0, ub, lb)
    z = jnp.where(participates, bound - x0, 0.0)

    def cond(c: _WalkCarry):
        # Each non-stopped round crosses >= 1 participating coordinate, so
        # nord (an exact int32 psum) bounds the trip count; the natural
        # exits are the stop test and pmin-exhaustion below.
        return (~c.stopped) & (c.rounds < nord)

    def body(c: _WalkCarry) -> _WalkCarry:
        remaining = participates & (~c.crossed)
        tnext = coll.pmin(jnp.min(jnp.where(remaining, brk, inf)),
                          axis_name)
        deltat = tnext - c.t
        # First-member stop test (Cauchy.h:193-256); tnext == +inf means
        # every participating coordinate is crossed (pmin over an empty
        # remaining set) — stop with the state preserved.  The explicit
        # exhaustion term also keeps a NaN deltatmin from walking on.
        stop_now = ((-c.fp / c.fpp) < deltat) | (tnext == inf)

        group = remaining & (brk == tnext)
        gv = jnp.where(group, g, 0.0)
        # Fused group reductions: G = W' g_group, sum gg, sum g*z.
        gmat = jnp.concatenate([bh.base.y, bh.base.s], axis=0)  # [2m, n]
        locals_ = jnp.concatenate([
            jnp.einsum("mn,n->m", gmat, gv, precision=lax.Precision.HIGHEST),
            jnp.stack([jnp.sum(gv * gv), jnp.sum(gv * z)])])
        red = coll.psum_scalar(locals_, axis_name)
        gvec = red[:2 * m].at[m:].multiply(theta)      # G in W row scaling
        sum_gg = red[2 * m]
        sum_gz = red[2 * m + 1]

        mg = mdense @ gvec
        vecc_new = c.vecc + deltat * c.vecp
        fp_new = c.fp + deltat * c.fpp + sum_gg + theta * sum_gz - \
            mg @ vecc_new
        fpp_new = c.fpp - theta * sum_gg - 2.0 * (mg @ c.vecp) - mg @ gvec
        vecp_new = c.vecp + gvec

        adv = ~stop_now
        return _WalkCarry(
            t=jnp.where(adv, tnext, c.t),
            fp=jnp.where(adv, fp_new, c.fp),
            fpp=jnp.where(adv, fpp_new, c.fpp),
            vecp=jnp.where(adv, vecp_new, c.vecp),
            vecc=jnp.where(adv, vecc_new, c.vecc),
            crossed=c.crossed | (group & adv),
            stopped=stop_now,
            rounds=c.rounds + 1)

    init = _WalkCarry(
        t=jnp.zeros((), dtype), fp=fp0, fpp=fpp0, vecp=vecp0,
        vecc=jnp.zeros((2 * m,), dtype),
        crossed=jnp.zeros((n,), bool),
        stopped=jnp.zeros((), bool), rounds=jnp.zeros((), jnp.int32))
    if axis_name is not None:
        # Only the per-coordinate crossed mask is shard-local; every other
        # carry component is a collective output and stays replicated.
        init = init._replace(crossed=coll.pvary(init.crossed, axis_name))
    out = lax.while_loop(cond, body, init)

    crossed = out.crossed
    ncrossed = coll.psum_scalar(jnp.sum(crossed.astype(jnp.int32)),
                                axis_name)
    nfree0 = coll.psum_scalar(jnp.sum(free0.astype(jnp.int32)), axis_name)
    crossed_all = (nfree0 == 0) & (ncrossed == nord)

    return _finish(x0, vecd, lb, ub, free0, participates, crossed,
                   crossed_all, out.t, out.fp, out.fpp, out.vecc, out.vecp)


def cauchy_point_walk_chunked(bh: bmat.BHistory, x0: Array, g: Array,
                              lb: Array, ub: Array,
                              axis_name: Optional[str] = None,
                              chunk: int = 64) -> CauchyResult:
    """Segment-walk GCP processing up to ``chunk`` break-point values per
    round — the sharded large-crossing path.

    :func:`cauchy_point_walk` pays one while-round (2 collectives) per
    distinct crossed break point; an early GCP from an interior start
    crosses ~ALL n coordinates (PERF.md), making cold-start huge-n box
    iterations loop-bound.  This variant advances K = ``chunk`` values at
    a time:

    1. local ``top_k`` of the remaining break points, ``all_gather`` of
       the [K] candidates, replicated merge -> the K globally smallest;
    2. ONE fused psum of the per-value group reductions [K, 2m+2]
       (membership resolved by a tiled first-occurrence one-hot, no
       gathers);
    3. a replicated K-step mini-scan applying the exact walk recurrence
       (Cauchy.h:183-256 group form) with the stop test per value.

    2 collectives per K crossed values instead of per value.  Duplicate
    candidates (ties across shards) collapse to zero-width zero-member
    steps; +inf padding fires the exhaustion stop, as in the walk.
    Results match :func:`cauchy_point_walk` (same recurrence, same group
    reductions) up to reduction reassociation inside the fused product.

    Measured single-chip (PERF.md): ~3x SLOWER than the plain walk — the
    [n, K] membership work costs more than the loop overhead it removes —
    so this is strictly the MULTI-CHIP option (collective latency per
    round is what K divides); per chip prefer ``prefix_sorted``.
    """
    n = x0.shape[0]
    m = bh.m
    dtype = x0.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    theta = bh.theta
    hp = lax.Precision.HIGHEST
    k_ = min(chunk, n)

    brk, vecd, free0, participates = _break_points(x0, g, lb, ub)
    nord = coll.psum_scalar(jnp.sum(participates.astype(jnp.int32)),
                            axis_name)

    vecp0 = bmat.apply_wtv(bh, vecd, axis_name)
    fp0 = -coll.psqnorm(vecd, axis_name)
    fpp0 = -theta * fp0 - vecp0 @ bmat.apply_mv(bh, vecp0)

    mdense = bh.mdense
    bound = jnp.where(vecd > 0.0, ub, lb)
    z = jnp.where(participates, bound - x0, 0.0)

    # Per-coordinate value rows [n, 2m+2]: g*y | g*s | g^2 | g*z (the s
    # block is theta-scaled AFTER the psum, matching cauchy_point_walk's
    # reduction order).  Tiled over n so the [c, K] one-hot stays small.
    v_rows = jnp.concatenate([
        (bh.base.y * g).T, (bh.base.s * g).T,
        (g * g)[:, None], (g * z)[:, None]], axis=1)
    c = max(1, min(n, _PERM_TILE // max(k_, 1)))
    pad = -(-n // c) * c - n
    if pad:
        brk_p = jnp.concatenate([brk, jnp.full((pad,), inf, dtype)])
        v_p = jnp.concatenate(
            [v_rows, jnp.zeros((pad, 2 * m + 2), dtype)], axis=0)
    else:
        brk_p, v_p = brk, v_rows
    brk_t = brk_p.reshape(-1, c)
    v_t = v_p.reshape(-1, c, 2 * m + 2)

    def cond(c_):
        return (~c_.stopped) & (c_.rounds < nord)

    def body(c_: _WalkCarry) -> _WalkCarry:
        remaining = participates & (~c_.crossed)
        # K smallest remaining break points, globally.
        loc = jnp.where(remaining, brk, inf)
        ts_local = -lax.top_k(-loc, k_)[0]          # ascending
        if axis_name is not None:
            # Invariant gather: one-row scatter + psum (lax.all_gather's
            # output is typed device-varying, which would poison the whole
            # trajectory's vma type; psum output is invariant).  Rows of
            # zeros sum away; break points are the only nonzero row per
            # position.
            d = lax.axis_size(axis_name)
            buf = jnp.zeros((d, k_), dtype).at[
                lax.axis_index(axis_name)].set(ts_local)
            ts_all = coll.psum_scalar(buf, axis_name).reshape(-1)
            ts = jnp.sort(ts_all)[:k_]
        else:
            ts = ts_local

        rem_p = jnp.concatenate(
            [remaining, jnp.zeros((pad,), bool)]) if pad else remaining
        rem_t = rem_p.reshape(-1, c)

        def tile(acc, xs):
            brk_c, rem_c, v_c = xs
            eq = (brk_c[:, None] == ts[None, :]) & rem_c[:, None]
            first = eq & (jnp.cumsum(eq, axis=1) == 1)
            return acc + jnp.einsum("ck,cj->kj", first.astype(dtype), v_c,
                                    precision=hp), None

        acc0 = coll.pvary(jnp.zeros((k_, 2 * m + 2), dtype), axis_name)
        locals_, _ = lax.scan(tile, acc0, (brk_t, rem_t, v_t))
        red = coll.psum_scalar(locals_, axis_name)   # [K, 2m+2]
        red = red.at[:, m:2 * m].multiply(theta)     # W row scaling

        def kstep(car, inp):
            tk, row = inp
            gvec, sum_gg, sum_gz = row[:2 * m], row[2 * m], row[2 * m + 1]
            deltat = tk - car.t
            stop_now = ((-car.fp / car.fpp) < deltat) | (tk == inf)
            mg = mdense @ gvec
            vecc_new = car.vecc + deltat * car.vecp
            fp_new = car.fp + deltat * car.fpp + sum_gg + \
                theta * sum_gz - mg @ vecc_new
            fpp_new = car.fpp - theta * sum_gg - 2.0 * (mg @ car.vecp) - \
                mg @ gvec
            vecp_new = car.vecp + gvec
            adv = (~car.stopped) & (~stop_now)
            return _WalkCarry(
                t=jnp.where(adv, tk, car.t),
                fp=jnp.where(adv, fp_new, car.fp),
                fpp=jnp.where(adv, fpp_new, car.fpp),
                vecp=jnp.where(adv, vecp_new, car.vecp),
                vecc=jnp.where(adv, vecc_new, car.vecc),
                crossed=car.crossed,
                stopped=car.stopped | stop_now,
                rounds=car.rounds), None

        out, _ = lax.scan(kstep, c_._replace(stopped=jnp.zeros((), bool)),
                          (ts, red))
        # Everything at or below the reached value is crossed (group
        # members cross together; values beyond the stop stay remaining).
        crossed = c_.crossed | (remaining & (brk <= out.t))
        return out._replace(crossed=crossed, rounds=c_.rounds + 1,
                            stopped=out.stopped)

    init = _WalkCarry(
        t=jnp.zeros((), dtype), fp=fp0, fpp=fpp0, vecp=vecp0,
        vecc=jnp.zeros((2 * m,), dtype),
        crossed=jnp.zeros((n,), bool),
        stopped=jnp.zeros((), bool), rounds=jnp.zeros((), jnp.int32))
    if axis_name is not None:
        init = init._replace(crossed=coll.pvary(init.crossed, axis_name))
    out = lax.while_loop(cond, body, init)

    crossed = out.crossed
    ncrossed = coll.psum_scalar(jnp.sum(crossed.astype(jnp.int32)),
                                axis_name)
    nfree0 = coll.psum_scalar(jnp.sum(free0.astype(jnp.int32)), axis_name)
    crossed_all = (nfree0 == 0) & (ncrossed == nord)

    return _finish(x0, vecd, lb, ub, free0, participates, crossed,
                   crossed_all, out.t, out.fp, out.fpp, out.vecc, out.vecp)


def cauchy_point_prefix_sorted(bh: bmat.BHistory, x0: Array, g: Array,
                               lb: Array, ub: Array,
                               axis_name: Optional[str] = None
                               ) -> CauchyResult:
    """:func:`cauchy_point_prefix` with argsort + gather permutation —
    the large-n single-instance path (O(n log n) instead of the one-hot
    form's O(n^2 / c) matmul FLOPs; identical results).  Not for vmapped
    batches (batched gathers lower terribly on TPU, CLAUDE.md)."""
    return cauchy_point_prefix(bh, x0, g, lb, ub, axis_name, perm="sort")


def cauchy_point_walk_auto(bh: bmat.BHistory, x0: Array, g: Array,
                           lb: Array, ub: Array,
                           axis_name: Optional[str] = None,
                           threshold: int = 16,
                           chunk: int = 64) -> CauchyResult:
    """Runtime-routed sharded GCP: plain walk for few crossings,
    ``walk_chunked`` for crossing-heavy rounds.

    Round-5 measured rule (`scripts/probe_walk_switchover.py`, 8-device
    CPU mesh, n=2^16, K-differenced): the chunked walk already beats the
    plain walk from ~16 crossings on a fabric with near-zero collective
    latency (c=16: 8-13 ms vs 13 ms; c=64: 17-22 vs 45; c=4096: 494-848
    vs 2373), and K=64 sits within ~25% of the best K everywhere above
    the threshold while costing ~2x at c<=4.  Real ICI adds ~2 x 50 us
    per ROUND, which the chunked form divides by K — so the CPU-mesh
    threshold is an upper bound for hardware.

    The crossing count is estimated BEFORE walking from quantities both
    variants compute anyway: the first segment's unconstrained stop
    ``dt1 = -fp'/fp''`` bounds the walk's reach, so
    ``c_est = #(brk <= dt1)`` (one psum) upper-bounds the crossed break
    points of the dominant first stretch; ``lax.cond`` then runs exactly
    one variant per call — a cold interior start routes chunked, an
    endgame iteration near its active set routes the plain walk.  Both
    branches produce the same GCP up to the chunked form's documented
    reduction reassociation.
    """
    dtype = x0.dtype
    theta = bh.theta
    brk, vecd, free0, participates = _break_points(x0, g, lb, ub)
    vecp0 = bmat.apply_wtv(bh, vecd, axis_name)
    fp0 = -coll.psqnorm(vecd, axis_name)
    fpp0 = -theta * fp0 - vecp0 @ bmat.apply_mv(bh, vecp0)
    fpp_safe = jnp.where(fpp0 > 0, fpp0, jnp.asarray(1.0, dtype))
    dt1 = jnp.maximum(-fp0 / fpp_safe, 0.0)
    c_est = coll.psum_scalar(
        jnp.sum((participates & (brk <= dt1)).astype(jnp.int32)),
        axis_name)
    return lax.cond(
        c_est >= threshold,
        lambda: cauchy_point_walk_chunked(bh, x0, g, lb, ub, axis_name,
                                          chunk=chunk),
        lambda: cauchy_point_walk(bh, x0, g, lb, ub, axis_name))


GCP_IMPLS = {"scan": cauchy_point, "prefix": cauchy_point_prefix,
             "prefix_sorted": cauchy_point_prefix_sorted,
             "walk": cauchy_point_walk,
             "walk_chunked": cauchy_point_walk_chunked,
             "walk_auto": cauchy_point_walk_auto}
