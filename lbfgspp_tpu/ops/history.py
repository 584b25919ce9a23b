"""L-BFGS correction history: the implicit B / H operators.

TPU-native re-design of the reference's ``BFGSMat`` class
(/root/reference/include/LBFGSpp/BFGSMat.h).  The reference keeps a mutable
object with an (s, y) ring buffer and in-place updates; here the same state is
an immutable fixed-shape pytree (:class:`LBFGSHistory`) so the whole solver
iteration can live inside one ``lax.while_loop`` and be freely ``vmap``-ped
(batch axis) and sharded (feature axis).

Layout decisions (TPU-first):

* ``s`` and ``y`` are stored as ``[m, n]`` row-major history matrices (one row
  per correction) instead of Eigen's ``[n, m]`` column storage — a row is
  contiguous on the minor axis, so the per-step dot/axpy of the two-loop
  recursion reads/writes full HBM lanes, and the ``S @ v`` / ``Y @ v``
  operator family is a single ``[m, n] x [n]`` matvec (one fused reduction →
  one ``psum`` when sharded).
* ``m`` is static (baked into shapes); ``ncorr``/``ptr`` are traced int32
  scalars.  The ring-buffer discipline matches BFGSMat.h:42-48 exactly:
  ``ptr`` starts at ``m`` so the first write lands in row 0 (BFGSMat.h:70),
  row ``(ptr - 1) mod m`` is the most recent correction.
* The curvature-gated update is expressed as an ``accept`` mask instead of the
  caller-side ``if`` (LBFGS.h:161), keeping the update branch-free so batched
  instances can disagree.

Under a sharded run, rows of ``s``/``y`` shard like ``x`` on the feature axis
and every reduction goes through :mod:`..parallel.collectives`; the ``[m]``
and scalar state replicates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll

Array = jax.Array


class LBFGSHistory(NamedTuple):
    """Implicit BFGS matrix state (BFGSMat.h:35-48).

    ``B = theta * I - W M W'`` and ``H = B^{-1}`` are never formed; see
    :func:`apply_hv` for the two-loop application of H and :func:`bmat` /
    :func:`hmat` for the dense accessors.

    On top of the reference's state, the TPU design caches the slot-ordered
    Gram matrices ``sy[i, j] = s_i . y_j`` and ``yy[i, j] = y_i . y_j``:
    they change only on ``add_correction`` (one fused [2m+2, 2] product)
    and turn the two-loop recursion into a *scalar* recursion plus two
    fused [2m, n] matvecs — one collective per H application instead of 2m
    (see :func:`apply_hv`).
    """

    s: Array       # [m, n] correction s-vectors (rows, ring order)
    y: Array       # [m, n] correction y-vectors
    ys: Array      # [m]    s'y per slot (BFGSMat.h:39)
    theta: Array   # scalar, B0 = theta * I scaling (BFGSMat.h:36)
    ncorr: Array   # int32 scalar, number of valid corrections (<= m)
    ptr: Array     # int32 scalar, ring pointer in [1, m], init m
                   # (BFGSMat.h:70: first write lands at slot ptr % m == 0)
    sy: Array      # [m, m] cached Gram s_i . y_j (slot order)
    yy: Array      # [m, m] cached Gram y_i . y_j
    rinv: Optional[Array] = None
                   # [m, m] R^{-1} in slot order (R = age-ordered
                   # triu(S'Y), the BNS compact-form factor), maintained
                   # incrementally for the ``tri="rinv"`` direction mode;
                   # None (the default) = not maintained (a None pytree
                   # leaf is an empty subtree, so checkpoints and carries
                   # of the default path are unchanged)

    @property
    def m(self) -> int:
        return self.s.shape[0]


def init_history(n: int, m: int, dtype=jnp.float32,
                 store_dtype=None, with_rinv: bool = False) -> LBFGSHistory:
    """Fresh history (BFGSMat::reset, BFGSMat.h:61-78).

    ``store_dtype`` (e.g. ``jnp.bfloat16``) stores the s/y rows at reduced
    precision while all inner products, Grams and coefficients stay in
    ``dtype`` — halving the HBM traffic of the dominant [2m, n] streams.
    The correction-pair products for the gate/Grams are computed from the
    full-precision incoming vectors, so only the materialized direction
    combine sees the rounding.

    ``with_rinv`` additionally maintains the incremental ``R^{-1}`` factor
    used by the ``tri="rinv"`` direction mode (see :func:`apply_hv`).
    """
    sdt = dtype if store_dtype is None else store_dtype
    return LBFGSHistory(
        s=jnp.zeros((m, n), sdt),
        y=jnp.zeros((m, n), sdt),
        ys=jnp.zeros((m,), dtype),
        theta=jnp.ones((), dtype),
        ncorr=jnp.zeros((), jnp.int32),
        ptr=jnp.asarray(m, jnp.int32),
        sy=jnp.zeros((m, m), dtype),
        yy=jnp.zeros((m, m), dtype),
        rinv=jnp.zeros((m, m), dtype) if with_rinv else None,
    )


def correction_products(hist: LBFGSHistory, s: Array, y: Array,
                        axis_name: Optional[str] = None):
    """All inner products a correction update needs, in ONE fused product
    (one collective when sharded):

        [Y_old; S_old; y; s] @ [y, s]'  ->  [2m + 2, 2]

    Returns ``(yx, sx, pair)`` where ``yx = [Y@y, Y@s]`` ([m, 2]),
    ``sx = [S@y, S@s]`` ([m, 2]) and ``pair = (s.y, y.y, s.s)``.
    """
    m = hist.m
    rhs = jnp.stack([y, s], axis=0)                         # [2, n]
    hp = lax.Precision.HIGHEST
    if s.shape[-1] >= (1 << 20):
        # LARGE n: three independent products instead of one [2m+2, n]
        # concatenated operand — each output element is the same dot
        # with the same reduction order (bit-identical values; a
        # bf16-stored history is promoted to f32 per-element either
        # way), but the concat MATERIALIZES a [2m+2, n] f32 buffer (the
        # bf16 rows upcast into it), a multi-GB allocation at n >= 2^26
        # that the AOT compiler rejects; the split form lets XLA fuse
        # the upcasts into the dot loops.  The single-collective
        # property is kept: the partials ride one psum below.
        prod = jnp.concatenate([
            jnp.einsum("an,bn->ab", hist.y, rhs, precision=hp),  # [m, 2]
            jnp.einsum("an,bn->ab", hist.s, rhs, precision=hp),  # [m, 2]
            jnp.einsum("an,bn->ab", rhs, rhs, precision=hp),     # [2, 2]
        ], axis=0)                                               # [2m+2, 2]
    else:
        # SMALL n: the one-fused-product form — at tiny n the three
        # separate matvecs cost measurable extra dispatch per iteration
        # (box bench n=10: ~6% of throughput, round-5 measurement), and
        # the [2m+2, n] concat is a few KB.
        stacked = jnp.concatenate([hist.y, hist.s, y[None, :],
                                   s[None, :]], axis=0)      # [2m+2, n]
        prod = jnp.einsum("an,bn->ab", stacked, rhs, precision=hp)
    if axis_name is not None:
        prod = lax.psum(prod, axis_name)
    yx = prod[:m]            # [m, 2]: col 0 = Y@y, col 1 = Y@s
    sx = prod[m:2 * m]       # [m, 2]: col 0 = S@y, col 1 = S@s
    sy_new = prod[2 * m + 1, 0]
    yy_new = prod[2 * m, 0]
    ss_new = prod[2 * m + 1, 1]
    return yx, sx, (sy_new, yy_new, ss_new)


@jax.custom_batching.custom_vmap
def _masked_row_write(buf: Array, row: Array, loc: Array,
                      accept: Array) -> Array:
    """``buf[loc] = row`` when ``accept``, batching-aware.

    Unbatched (single / sharded solve): a ``lax.cond`` around one dynamic
    row update — O(n) traffic instead of rewriting the whole [m, n] buffer.
    Batched (vmap): per-lane ``loc`` would make the row update a batched
    scatter, which lowers terribly on TPU, so the vmap rule uses a
    broadcast select over the slot axis instead."""
    return lax.cond(
        accept,
        lambda b: lax.dynamic_update_index_in_dim(b, row, loc, 0),
        lambda b: b, buf)


@_masked_row_write.def_vmap
def _masked_row_write_vmap(axis_size, in_batched, buf, row, loc, accept):
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x[None],
                                                  (axis_size,) + x.shape)
    buf, row, loc, accept = (bc(x, b) for x, b in
                             zip((buf, row, loc, accept), in_batched))
    m = buf.shape[1]
    write = accept[:, None] & (jnp.arange(m)[None, :] == loc[:, None])
    return jnp.where(write[:, :, None], row[:, None, :], buf), True


def _write_correction(hist: LBFGSHistory, s: Array, y: Array, accept: Array,
                      yx: Array, sx: Array, pair) -> LBFGSHistory:
    """Masked ring-buffer write given precomputed products.

    The O(m n) s/y rows go through the batching-aware row writer; the tiny
    [m]/[m, m] state uses broadcast selects on a ``slot == loc`` mask.
    """
    m = hist.m
    loc = hist.ptr % m
    ys, yy_new, _ = pair
    slots = jnp.arange(m)
    is_loc = slots == loc
    write = accept & is_loc                      # [m] row-write mask

    new_s = _masked_row_write(hist.s, s.astype(hist.s.dtype), loc, accept)
    new_y = _masked_row_write(hist.y, y.astype(hist.y.dtype), loc, accept)
    new_ys = jnp.where(write, ys, hist.ys)
    new_theta = jnp.where(accept, yy_new / ys, hist.theta)
    new_ncorr = jnp.where(accept, jnp.minimum(hist.ncorr + 1, m), hist.ncorr)
    new_ptr = jnp.where(accept, (loc + 1).astype(jnp.int32), hist.ptr)

    # Gram updates (slot order): row loc = <new vec, old slots>, column loc
    # = <old slots, new vec>, with the new-pair products at the crossing.
    sy_row = jnp.where(is_loc, ys, yx[:, 1])        # s_new . y_j
    sy_col = jnp.where(is_loc, ys, sx[:, 0])        # s_i . y_new
    yy_row = jnp.where(is_loc, yy_new, yx[:, 0])    # y_new . y_j

    new_sy = jnp.where(write[:, None], sy_row[None, :], hist.sy)
    new_sy = jnp.where(write[None, :], sy_col[:, None], new_sy)
    new_yy = jnp.where(write[:, None], yy_row[None, :], hist.yy)
    new_yy = jnp.where(write[None, :], yy_row[:, None], new_yy)

    new_rinv = hist.rinv
    if hist.rinv is not None:
        # Incremental R^{-1} (R = age-ordered triu(S'Y)).  Replacing the
        # oldest correction (slot loc) with the newest is, in age order,
        # "drop first row/col, append last row/col":
        #   drop:   Rinv22 = Rinv with row/col loc zeroed (the inverse of
        #           a triangular matrix restricted to its trailing block
        #           IS the trailing block of the inverse);
        #   append: Rinv_new = [[Rinv22, -Rinv22 c / d], [0, 1/d]] with
        #           c_i = s_i . y_new (old slots) and d = s_new . y_new —
        #           one [m, m] @ [m] matvec per accepted correction.
        # Each column is thus computed once on entry and only ever zeroed
        # afterwards: no sliding-window rounding accumulation.
        dtype = hist.rinv.dtype
        at_loc = is_loc
        # Validity mask over the PRE-WRITE ring: on a healthy history
        # invalid slots hold zero rows/rinv entries so this is a no-op,
        # but after a SOFT reset (ncorr zeroed, stale arrays left in
        # place — the on_ls_fail="restart" path) the stale slot data
        # must not leak into the new column.
        dist = (hist.ptr - 1 - slots) % m
        valid = dist < hist.ncorr
        live = valid & ~at_loc
        rz = jnp.where(live[:, None] & live[None, :], hist.rinv, 0.0)
        c_vec = jnp.where(live, sx[:, 0].astype(dtype), 0.0)  # s_i.y_new
        d_safe = jnp.where(ys != 0, ys, 1.0).astype(dtype)
        col = -(rz @ c_vec) / d_safe
        col = jnp.where(at_loc, 1.0 / d_safe, col)
        cand = jnp.where(at_loc[None, :], col[:, None], rz)
        new_rinv = jnp.where(accept, cand, hist.rinv)

    return LBFGSHistory(new_s, new_y, new_ys, new_theta, new_ncorr, new_ptr,
                        new_sy, new_yy, new_rinv)


def add_correction(hist: LBFGSHistory, s: Array, y: Array,
                   accept: Array,
                   axis_name: Optional[str] = None) -> LBFGSHistory:
    """Masked ring-buffer write of one correction pair.

    Mirrors BFGSMat::add_correction (BFGSMat.h:81-97): write (s, y) at slot
    ``loc = ptr % m``, record ``ys = s'y``, set ``theta = y'y / ys``, bump
    ``ncorr`` (saturating at m) and advance ``ptr``.  When ``accept`` is
    False the state is unchanged — the caller's curvature gate
    ``s'y > eps * y'y`` (LBFGS.h:161, LBFGSB.h:237) skips the pair but leaves
    the buffer untouched.
    """
    yx, sx, pair = correction_products(hist, s, y, axis_name)
    return _write_correction(hist, s, y, accept, yx, sx, pair)


def update_history(hist: LBFGSHistory, s: Array, y: Array, allow: Array,
                   axis_name: Optional[str] = None):
    """Fused curvature gate + correction write: one collective total.

    Applies the reference's gate ``s'y > eps_machine * y'y`` (LBFGS.h:161)
    under the caller's ``allow`` mask.  Returns ``(new_hist, accept)``.
    """
    eps = jnp.finfo(s.dtype).eps
    yx, sx, pair = correction_products(hist, s, y, axis_name)
    sy_new, yy_new, _ = pair
    accept = allow & (sy_new > eps * yy_new)
    return _write_correction(hist, s, y, accept, yx, sx, pair), accept


def _age_slots(hist: LBFGSHistory):
    """Slot index per age step t (newest first) and validity mask."""
    m = hist.m
    t = jnp.arange(m, dtype=jnp.int32)
    slots = (hist.ptr - 1 - t) % m
    valid = t < hist.ncorr
    return slots, valid


def apply_hv(hist: LBFGSHistory, v: Array, a,
             axis_name: Optional[str] = None,
             tri: str = "sweeps") -> Array:
    """Two-loop recursion computing ``a * H * v`` (BFGSMat.h:276-302;
    Nocedal & Wright Alg. 7.4), in compact (Gram-cached) form.

    The classical two-loop interleaves 2m global dots with 2m axpys.  Using
    the cached Grams ``sy``/``yy`` the inner products unroll algebraically:

        alpha_j = (a * (S v)_j  - sum_{u newer} alpha_u sy[j, u]) / ys_j
        beta_j  = ((a * (Y v)_j - sum_t alpha_t yy[j, t]) / theta
                   + sum_{u older} (alpha_u - beta_u) sy[u, j]) / ys_j
        res     = (a / theta) v - (1/theta) Y'alpha + S'(alpha - beta)

    so one fused ``[2m, n] @ [n]`` matvec (ONE psum when sharded) plus an
    O(m^2) scalar recursion replaces the 2m-collective sequential chain —
    identical math, reassociated summation.

    ``tri`` selects the triangular-solve schedule for the alpha/beta
    recursions: ``"sweeps"`` (default) runs m masked Jacobi sweeps — the
    Horner form of the nilpotent Neumann series, 2m sequential [m] matvecs
    — and is the bit-parity path the oracle tests pin; ``"doubling"``
    evaluates the same series by repeated squaring in ceil(log2(m)) steps
    (2*ceil(log2(m)) matvecs + as many [m, m] matmuls) — the same values
    up to reassociation rounding (measured SLOWER batched: [B, m, m]
    matmuls lower poorly); ``"rinv"`` applies the incrementally-maintained
    ``hist.rinv`` factor — three [m, m] matvecs, no sequential solve, the
    batched throughput mode (``lbfgs.minimize(..., direction="rinv")``).
    """
    # Batched on-chip solves route through the Pallas-fused kernel (one HBM
    # pass over s/y); single/sharded/f64/mixed-storage solves use the XLA
    # path below.
    if tri == "sweeps" and isinstance(a, (int, float)) \
            and hist.s.dtype == v.dtype:
        from . import fused
        if fused.fused_available(v.dtype, axis_name):
            return fused.apply_hv_fused(hist, v, float(a))

    m = hist.m
    dtype = v.dtype
    a = jnp.asarray(a, dtype)
    hp = lax.Precision.HIGHEST

    sv_local = jnp.einsum("mn,n->m", hist.s, v, precision=hp)
    yv_local = jnp.einsum("mn,n->m", hist.y, v, precision=hp)
    if axis_name is not None:
        # Both [m] partials ride one length-2m psum.
        red = lax.psum(jnp.concatenate([sv_local, yv_local]), axis_name)
        sv, yv = red[:m], red[m:]
    else:
        sv, yv = sv_local, yv_local

    # Work directly in slot space: slot j is "newer than" slot i iff its
    # ring distance d = (ptr - 1 - slot) mod m is smaller.  The triangular
    # alpha/beta substitutions become m masked Jacobi sweeps — exact for a
    # triangular system after m sweeps, and free of the permutation
    # gathers/matmuls that dominate the batched op cost.
    slot_ids = jnp.arange(m)
    dist = (hist.ptr - 1 - slot_ids) % m                    # [m]
    valid = dist < hist.ncorr
    newer = (dist[None, :] < dist[:, None]) & valid[:, None] & valid[None, :]
    ys_safe = jnp.where(valid, hist.ys, 1.0)
    vmaskf = valid.astype(dtype)

    msy = jnp.where(newer, hist.sy, 0.0)                    # [m, m]
    older = (dist[None, :] > dist[:, None]) & valid[:, None] & valid[None, :]
    msyT = jnp.where(older, hist.sy.T, 0.0)
    theta = hist.theta

    if tri == "rinv":
        # The two recursions ARE triangular solves with the BNS factor:
        # alpha = R^{-1} (a Sv) and (D + O) beta = base + O alpha with
        # D + O = R^T (slot space), so
        #   beta = R^{-T}(base + (R^T - D) alpha)
        #        = alpha - R^{-T}(ys * alpha - base).
        # With the incrementally-maintained hist.rinv this is THREE [m, m]
        # matvecs and no sequential solve at all.
        if hist.rinv is None:
            raise ValueError("tri='rinv' needs a history built with "
                             "init_history(with_rinv=True)")
        alpha = hist.rinv @ (a * sv)
        base = (a * yv - hist.yy @ alpha) / theta
        beta = alpha - hist.rinv.T @ (hist.ys * alpha - base)
        beta = vmaskf * beta
    elif tri == "doubling":
        # Both recursions are unit-triangular solves (D + N) x = rhs with
        # N strictly triangular in age order, i.e. A = D^{-1}N nilpotent
        # (A^m = 0).  x = sum_k (-A)^k D^{-1} rhs, evaluated by repeated
        # squaring: x <- x + B x, B <- B^2 with B = -A covers 2^K terms in
        # K steps.  Same values as the sweeps up to reassociation rounding
        # (exactness tested in tests/test_history.py).
        n_steps = max(1, (m - 1).bit_length())

        def tri_solve(nmat, rhs):
            b_mat = -(nmat / ys_safe[:, None])
            x = vmaskf * rhs / ys_safe
            for _ in range(n_steps):
                x = x + b_mat @ x
                b_mat = b_mat @ b_mat
            return vmaskf * x

        alpha = tri_solve(msy, a * sv)
        base = (a * yv - hist.yy @ alpha) / theta
        # (D + O) beta = base + O alpha.
        beta = tri_solve(msyT, base + msyT @ alpha)
    else:
        # The bit-parity default (the oracle tests pin these exact values;
        # keep the association of every expression unchanged).
        # Loop 1 (newest -> oldest): alpha_i = (a sv_i - sum_{j newer}
        # sy[i, j] alpha_j) / ys_i, via m sweeps of the masked recursion.
        rhs_a = a * sv
        alpha = jnp.zeros((m,), dtype)
        for _ in range(m):
            alpha = vmaskf * (rhs_a - msy @ alpha) / ys_safe

        # Loop 2 (oldest -> newest): beta_i = (base_i + sum_{j older}
        # sy[j, i] (alpha_j - beta_j)) / ys_i with
        # base = (a yv - yy alpha) / theta.
        base = (a * yv - hist.yy @ alpha) / theta
        beta = jnp.zeros((m,), dtype)
        for _ in range(m):
            beta = vmaskf * (base + msyT @ (alpha - beta)) / ys_safe

    # Final combination: two [m, n] matvecs, local (coefficients
    # replicated); s/y are read straight from the history rows (no concat).
    w_s = jnp.where(valid, alpha - beta, 0.0)
    w_y = jnp.where(valid, -alpha / theta, 0.0)
    return ((a / theta) * v
            + jnp.einsum("m,mn->n", w_s, hist.s, precision=hp)
            + jnp.einsum("m,mn->n", w_y, hist.y, precision=hp))


def apply_hv_reference(hist: LBFGSHistory, v: Array, a,
                       axis_name: Optional[str] = None) -> Array:
    """The literal sequential two-loop (BFGSMat.h:276-302), kept as the
    semantics oracle for :func:`apply_hv` and for exact-order parity
    studies.  2m collectives when sharded."""
    m = hist.m
    dtype = v.dtype
    res = jnp.asarray(a, dtype) * v

    alphas = []
    rows = []
    for i in range(m):
        j = (hist.ptr - 1 - i) % m
        active = i < hist.ncorr
        sj = lax.dynamic_index_in_dim(hist.s, j, 0, keepdims=False)
        yj = lax.dynamic_index_in_dim(hist.y, j, 0, keepdims=False)
        ysj = lax.dynamic_index_in_dim(hist.ys, j, 0, keepdims=False)
        ysj_safe = jnp.where(active, ysj, jnp.ones((), dtype))
        alpha = jnp.where(active, coll.pdot(sj, res, axis_name) / ysj_safe,
                          jnp.zeros((), dtype))
        res = res - alpha * yj
        alphas.append(alpha)
        rows.append((sj, yj, ysj_safe, active))

    res = res / hist.theta

    for i in reversed(range(m)):
        sj, yj, ysj_safe, active = rows[i]
        beta = jnp.where(active, coll.pdot(yj, res, axis_name) / ysj_safe,
                         jnp.zeros((), dtype))
        res = res + (alphas[i] - beta) * sj
    return res


def rinv_from_grams(hist: LBFGSHistory) -> Array:
    """Reconstruct the slot-order ``R^{-1}`` (R = age-ordered ``triu(S'Y)``,
    the BNS compact-form factor) from the cached Gram ``sy`` alone — for
    adopting a history that was built without ``with_rinv=True`` into the
    ``tri="rinv"`` direction mode (e.g. warm-starting a continuation phase
    from a sweeps-mode solve).

    ``R = D + N`` with ``D = diag(ys)`` and ``N`` the strictly-older part of
    the Gram, so ``R^{-1} = (sum_k (-D^{-1} N)^k) D^{-1}`` — the nilpotent
    Neumann series, evaluated by repeated squaring in ceil(log2(m)) steps.
    Matches the incrementally-maintained factor to rounding
    (tests/test_history.py).
    """
    m = hist.m
    dtype = hist.sy.dtype
    slot_ids = jnp.arange(m)
    dist = (hist.ptr - 1 - slot_ids) % m          # age-from-newest per slot
    valid = dist < hist.ncorr
    pair_valid = valid[:, None] & valid[None, :]
    ys_safe = jnp.where(valid, hist.ys, 1.0)
    # Strictly-older mask: row i older than column j (dist_i > dist_j).
    n_strict = jnp.where(pair_valid & (dist[:, None] > dist[None, :]),
                         hist.sy, 0.0)
    b = -(n_strict / ys_safe[:, None])
    acc = jnp.eye(m, dtype=dtype)
    for _ in range(max(1, (m - 1).bit_length())):
        acc = acc + b @ acc
        b = b @ b
    rinv = acc / ys_safe[None, :]
    return jnp.where(pair_valid, rinv, 0.0)


def _age_order_indices(hist: LBFGSHistory) -> Array:
    """Slot indices in oldest-to-newest order, padded cyclically.

    The reference materializes W columns oldest-first (BFGSMat.h:166-172).
    Entry ``i`` is the slot of the i-th oldest correction; entries with
    ``i >= ncorr`` are meaningless and must be masked by the caller.
    """
    m = hist.m
    i = jnp.arange(m, dtype=jnp.int32)
    return (hist.ptr - hist.ncorr + i) % m


def _w_matrices(hist: LBFGSHistory):
    """(Y_age [m, n], S_age [m, n], valid [m]) in age order, zero-padded."""
    idx = _age_order_indices(hist)
    valid = jnp.arange(hist.m) < hist.ncorr
    y_age = jnp.where(valid[:, None], hist.y[idx], 0.0)
    s_age = jnp.where(valid[:, None], hist.s[idx], 0.0)
    return y_age, s_age, valid


def bmat(hist: LBFGSHistory) -> Array:
    """Dense ``B = theta*I - W Minv^{-1} W'`` with ``W = [Y, theta*S]``
    (BFGSMat::get_Bmat, BFGSMat.h:150-208).

    Fixed-shape version: unused history slots contribute zero columns to W and
    identity rows/cols to Minv, so the result is exact for any ``ncorr``.
    Used by the ``final_approx_hessian`` accessor (LBFGS.h:192) and as a test
    oracle against :func:`apply_hv`.
    """
    m = hist.m
    n = hist.s.shape[1]
    dtype = hist.s.dtype
    y_age, s_age, valid = _w_matrices(hist)
    theta = hist.theta

    # D = diag(s_i'y_i), L[i, j] = s_i'y_j for i > j, SS = S'S (age order).
    sy = s_age @ y_age.T       # sy[i, j] = s_i . y_j
    ss = s_age @ s_age.T
    d = jnp.diag(jnp.diag(sy))
    l_mat = jnp.tril(sy, k=-1)

    pair_valid = valid[:, None] & valid[None, :]
    minv = jnp.block([[-d, l_mat.T], [l_mat, theta * ss]])
    vmask = jnp.concatenate([pair_valid, pair_valid], axis=1)
    vmask = jnp.concatenate([vmask, vmask], axis=0)
    minv = jnp.where(vmask, minv, jnp.eye(2 * m, dtype=dtype))

    w = jnp.concatenate([y_age, theta * s_age], axis=0)   # [2m, n]
    mid = jnp.linalg.solve(minv, w)                       # Minv^{-1} W'
    return theta * jnp.eye(n, dtype=dtype) - w.T @ mid


def hmat(hist: LBFGSHistory) -> Array:
    """Dense ``H = I/theta + W M W'`` with ``W = [Y/theta, S]``
    (BFGSMat::get_Hmat, BFGSMat.h:211-271).

    Uses the Byrd-Nocedal-Schnabel closed form with
    ``M = [[0, -R^{-1}], [-R^{-T}, R^{-T}(D + Y'Y/theta)R^{-1}]]`` where
    ``R[i, j] = s_i'y_j`` for i <= j (age order, BFGSMat.h:241-263).
    """
    m = hist.m
    n = hist.s.shape[1]
    dtype = hist.s.dtype
    y_age, s_age, valid = _w_matrices(hist)
    theta = hist.theta

    sy = s_age @ y_age.T
    r = jnp.triu(sy)
    # Pad unused diagonal entries with 1 so R is invertible; the padded
    # rows/cols multiply zero W columns downstream.
    r = jnp.where(valid[:, None] & valid[None, :], r,
                  jnp.eye(m, dtype=dtype))
    rinv = jax.scipy.linalg.solve_triangular(r, jnp.eye(m, dtype=dtype),
                                             lower=False)
    yy = y_age @ y_age.T
    d_diag = jnp.diag(sy)
    block = yy / theta + jnp.diag(d_diag)
    br = rinv.T @ block @ rinv
    mmat = jnp.block([[jnp.zeros((m, m), dtype), -rinv],
                      [-rinv.T, br]])
    w = jnp.concatenate([y_age / theta, s_age], axis=0)   # [2m, n]
    return jnp.eye(n, dtype=dtype) / theta + w.T @ (mmat @ w)
