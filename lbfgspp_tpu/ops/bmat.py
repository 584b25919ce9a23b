"""B-mode BFGS matrix state: the W/M operator family for L-BFGS-B.

TPU-native re-design of the L-BFGS-B half of the reference's ``BFGSMat`` class
(/root/reference/include/LBFGSpp/BFGSMat.h:99-615).  On top of the base
ring-buffer history (:mod:`.history`) the box-constrained solver needs the
implicit representation ``B = theta*I - W M W'`` with ``W = [Y, theta*S]`` and
``M = inv(Minv)``, where ``Minv`` is the 2m x 2m "middle matrix"

    Minv = [ -D   L'          ]
           [  L   theta * S'S ]

maintained incrementally on every correction (BFGSMat.h:99-146) and factorized
with Bunch-Kaufman LDL' (:mod:`.bkldlt`).

Fixed-shape design notes:

* Everything is **slot-indexed**: vectors in "W space" have length ``2m``
  laid out as ``[y-part (m slots); s-part (m slots)]``.  The reference stores
  the same identity-padded 2m x 2m ``m_permMinv`` (reset to I, BFGSMat.h:72-77)
  and pads compact ``2*ncorr`` vectors with zeros before solving
  (apply_Mv, BFGSMat.h:361-376) — because slots fill sequentially, the
  slot layout *is* the reference's padded layout, so no permutation is needed.
* Index sets (P/L/U/free/active) become boolean ``[n]`` masks; every
  row-gather ``Wb(IndexSet)`` (BFGSMat.h:338-358) becomes a masked product,
  so all shapes are static and the whole solver stays inside one
  ``lax.while_loop`` under ``jit``/``vmap``.
* ``S'S`` is stored unscaled; ``theta`` is applied when building the
  factorization input, mirroring the scale/factorize/unscale dance at
  BFGSMat.h:143-145.
* ``M`` is materialized densely once per factorization
  (``mdense = solve(Minv_scaled, I)``, 2m=12 columns) so the hot GCP scan and
  BOXCQP iterations apply ``M v`` as one tiny matvec instead of a sequential
  triangular solve — same operator, TPU-friendly data flow.

Sharding: ``s``/``y`` rows shard like ``x`` on the feature axis; every [n]
reduction funnels through :mod:`..parallel.collectives`; all [2m]/[2m, 2m]
state is replicated.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from . import bkldlt
from .history import (LBFGSHistory, init_history, correction_products,
                      _write_correction)

Array = jax.Array


class BHistory(NamedTuple):
    """L-BFGS-B matrix state: base history + middle matrix + its inverse."""

    base: LBFGSHistory
    minv: Array     # [2m, 2m] symmetric middle matrix, S'S block unscaled,
                    # identity at unused slots (BFGSMat.h:51, :72-77)
    mdense: Array   # [2m, 2m] dense inverse of the theta-scaled minv
                    # (the operator M; reference keeps a BKLDLT factorization,
                    # BFGSMat.h:52, :143-145)
    info: Array     # int32 LATCHED numerical status: 0 = every middle-matrix
                    # factorization this history has seen succeeded; > 0 =
                    # some factorization hit a zero/failed pivot (mirrors
                    # BKLDLT's COMPUTATION_INFO, BKLDLT.h:15-20).  The
                    # reference never checks it and relies on downstream
                    # self-healing (BOXCQP fallbacks, line-search rescue,
                    # matrix reset) — so does this solver; the flag is
                    # observability, surfaced as ``SolveResult.history.info``.
                    # A pathological-direction matrix reset clears it.

    @property
    def m(self) -> int:
        return self.base.m

    @property
    def theta(self) -> Array:
        return self.base.theta


# Module-wide DEFAULT for the middle-matrix solve routing — the per-call
# ``middle_solve="gj"|"bkldlt"`` argument (threaded from
# ``lbfgsb.solver``/``minimize_b`` down through every factorization site)
# overrides it.  When True, calls that don't specify ``middle_solve`` use
# the faithful Bunch-Kaufman LDL' (:mod:`.bkldlt`) exactly like the
# reference; when False they use the statically-unrolled Gauss-Jordan
# elimination — algebraically the same solve, far cheaper to compile and
# TPU/vmap-friendly.  Kept for back-compat with round-2/3 callers; new
# code should pass ``middle_solve`` explicitly.
USE_BKLDLT = False

#: Valid values for the per-call ``middle_solve`` option.
MIDDLE_SOLVES = ("gj", "bkldlt")


def _resolve_middle_solve(middle_solve):
    """Map the per-call option (or None = module default) to a mode."""
    if middle_solve is None:
        return "bkldlt" if USE_BKLDLT else "gj"
    if middle_solve not in MIDDLE_SOLVES:
        raise ValueError(
            f"middle_solve must be one of {MIDDLE_SOLVES}, "
            f"got {middle_solve!r}")
    return middle_solve


def _dense_inv(a: Array) -> Array:
    """Inverse of a small dense matrix by Gauss-Jordan elimination with
    partial pivoting, as a ``lax.fori_loop``.

    Chosen over ``jnp.linalg.solve`` deliberately: XLA's LuDecomposition
    expander is heavyweight to compile and lacks f64 on TPU, while a 2m x 2m
    (=12x12 default) elimination is a 12-step loop of rank-1 updates that
    compiles in milliseconds, runs in VMEM, and vmaps cleanly for batch mode.
    Partial pivoting gives the same solution as the reference's Bunch-Kaufman
    solve (BKLDLT.h) up to roundoff; set :data:`USE_BKLDLT` for the faithful
    factorization.
    """
    n = a.shape[0]
    dtype = a.dtype
    rows = jnp.arange(n)
    aug = jnp.concatenate([a, jnp.eye(n, dtype=dtype)], axis=1)

    def body(k, aug, bad):
        # One-hot row swap: traced pivot index p would otherwise become a
        # batched gather/scatter under vmap.  Written values are identical.
        col = jnp.where(rows >= k, jnp.abs(aug[:, k]), -1.0)
        p = jnp.argmax(col)
        ep = (rows == p)[:, None]
        ek = (rows == k)[:, None]
        rowk = aug[k]
        rowp = jnp.sum(jnp.where(ep, aug, 0.0), axis=0)
        aug = jnp.where(ek, rowp[None, :], jnp.where(ep, rowk[None, :], aug))
        piv = rowp[k]
        bad = bad | (piv == 0.0)
        piv = jnp.where(piv == 0.0, jnp.ones((), dtype), piv)
        newk = aug[k] / piv
        factors = jnp.where(rows == k, 0.0, aug[:, k])
        return jnp.where(ek, newk[None, :],
                         aug - jnp.outer(factors, newk)), bad

    # Statically unrolled (n = 2m = 12 by default): identical arithmetic to
    # a fori_loop, but XLA fuses the whole elimination into one kernel —
    # under vmap the loop-control overhead dominated the batched box solve.
    bad = jnp.zeros((), bool)
    for k in range(n):
        aug, bad = body(k, aug, bad)
    return aug[:, n:], bad.astype(jnp.int32)


def _sym_solve(a: Array, b: Array, middle_solve=None):
    """Solve ``a x = b`` for the (possibly indefinite) symmetric 2m x 2m
    middle matrix: Bunch-Kaufman LDL' (BFGSMat.h:52, :558) or Gauss-Jordan,
    routed by ``middle_solve`` ("gj"/"bkldlt"; None = module default).
    Returns ``(x, info)`` with ``info > 0`` mirroring the factorization's
    NUMERICAL_ISSUE status (BKLDLT.h:15-20)."""
    if _resolve_middle_solve(middle_solve) == "bkldlt":
        fac = bkldlt.compute(a)
        if b.ndim == 1:
            return bkldlt.solve(fac, b), fac.info
        return jax.vmap(lambda col: bkldlt.solve(fac, col),
                        in_axes=1, out_axes=1)(b), fac.info
    inv, info = _dense_inv(a)
    return inv @ b, info


def _factor_minv(minv: Array, theta: Array, m: int, middle_solve=None):
    """Factorize the theta-scaled middle matrix and materialize its inverse.

    Mirrors BFGSMat.h:143-145 (scale S'S block by theta, factorize, unscale).
    Returns ``(mdense, info)`` where ``mdense @ v`` equals the reference's
    ``m_permMsolver.solve(v)``.
    """
    dtype = minv.dtype
    # Only the S'S block is scaled by theta: rows >= m AND cols >= m.
    sel = jnp.arange(2 * m) >= m
    block_mask = sel[:, None] & sel[None, :]
    scaled = jnp.where(block_mask, minv * theta, minv)
    mdense, info = _sym_solve(scaled, jnp.eye(2 * m, dtype=dtype),
                              middle_solve)
    return mdense, info


def init_b_history(n: int, m: int, dtype=jnp.float32,
                   middle_solve=None) -> BHistory:
    """Fresh B-mode history (BFGSMat::reset with LBFGSB=true,
    BFGSMat.h:61-78)."""
    base = init_history(n, m, dtype)
    minv = jnp.eye(2 * m, dtype=dtype)
    mdense, info = _factor_minv(minv, base.theta, m, middle_solve)
    return BHistory(base=base, minv=minv, mdense=mdense, info=info)


def add_correction_b(bh: BHistory, s: Array, y: Array, accept: Array,
                     axis_name: Optional[str] = None,
                     middle_solve=None) -> BHistory:
    """Masked correction update including the middle matrix
    (BFGSMat::add_correction, B branch, BFGSMat.h:81-147).

    Incremental updates, all gated by ``accept``:

    * ``Minv[loc, loc] = -s'y`` (the -D block, BFGSMat.h:107);
    * row/column ``m + loc`` of the S'S block gets ``S's_new``
      (BFGSMat.h:111-113);
    * the L-block row for the new ``s`` holds ``s_new' y_j`` for the
      ``ncorr - 1`` most recent *older* corrections (BFGSMat.h:115-140);
      writing the whole ring-distance-masked row also re-zeroes the stale
      column of the overwritten slot (the ``setZero`` at BFGSMat.h:129-130);
    * refactorize (BFGSMat.h:143-145).
    """
    yx, sx, pair = correction_products(bh.base, s, y, axis_name)
    return _finish_correction_b(bh, s, y, accept, yx, sx, pair, middle_solve)


def update_history_b(bh: BHistory, s: Array, y: Array, allow: Array,
                     axis_name: Optional[str] = None,
                     middle_solve=None):
    """Fused curvature gate + B-mode correction: one collective total
    (the gate at LBFGSB.h:237 plus BFGSMat.h:81-147)."""
    eps = jnp.finfo(s.dtype).eps
    yx, sx, pair = correction_products(bh.base, s, y, axis_name)
    sy_new, yy_new, _ = pair
    accept = allow & (sy_new > eps * yy_new)
    return _finish_correction_b(bh, s, y, accept, yx, sx, pair,
                                middle_solve), accept


def _finish_correction_b(bh: BHistory, s: Array, y: Array, accept: Array,
                         yx: Array, sx: Array, pair,
                         middle_solve=None) -> BHistory:
    """All ``minv`` writes are one-hot masked selects (no dynamic slicing):
    ``loc`` is a traced per-instance scalar, so under ``vmap`` a
    ``dynamic_update_slice`` would become a batched scatter — which lowers
    terribly on TPU — while a ``where`` over the tiny [2m, 2m] matrix fuses
    into plain vector ops.  The written values are bit-identical to the
    reference's in-place updates (BFGSMat.h:99-146)."""
    m = bh.m
    loc = (bh.base.ptr % m).astype(jnp.int32)
    base = _write_correction(bh.base, s, y, accept, yx, sx, pair)
    new_ncorr = base.ncorr

    ys_new, _, ss_new = pair
    slots = jnp.arange(m)
    slots_eq_loc = slots == loc
    # s_j . s_new over all slots (new pair product on the diagonal)
    ss_all = jnp.where(slots_eq_loc, ss_new, sx[:, 1])
    # y_j . s_new over all slots
    sy_all = jnp.where(slots_eq_loc, ys_new, yx[:, 1])

    valid = slots < new_ncorr

    # One-hot row/col selectors over the [2m] slot axis.
    e_top = jnp.concatenate([slots_eq_loc, jnp.zeros((m,), bool)])  # slot loc
    e_bot = jnp.concatenate([jnp.zeros((m,), bool), slots_eq_loc])  # m + loc
    top_half = jnp.arange(2 * m) < m
    valid_bot = jnp.concatenate([jnp.zeros((m,), bool), valid])

    minv = bh.minv
    # -D block diagonal entry (BFGSMat.h:107).
    minv = jnp.where(accept & (e_top[:, None] & e_top[None, :]),
                     -ys_new, minv)

    # S'S row and column m+loc over valid slots (others keep identity,
    # BFGSMat.h:111-113).
    ss2 = jnp.concatenate([ss_all, ss_all])        # value by column slot
    minv = jnp.where(accept & (e_bot[:, None] & valid_bot[None, :]),
                     ss2[None, :], minv)
    minv = jnp.where(accept & (valid_bot[:, None] & e_bot[None, :]),
                     ss2[:, None], minv)

    # When the buffer is full the overwritten slot's y column carries stale
    # L entries (s_i' y_old) for every i — zero the column (and its mirror
    # row), matching the setZero at BFGSMat.h:129-130.
    stale = accept & (new_ncorr == m)
    minv = jnp.where(stale & ((~top_half)[:, None] & e_top[None, :]),
                     0.0, minv)
    minv = jnp.where(stale & (e_top[:, None] & (~top_half)[None, :]),
                     0.0, minv)

    # L-block row for the new s: entries for ring distance 1..ncorr-1
    # (BFGSMat.h:115-140); writing the whole row also re-zeroes the stale
    # entries of the overwritten slot.
    dist = (loc - slots) % m
    in_window = (dist >= 1) & (dist <= new_ncorr - 1)
    l_row = jnp.where(in_window, sy_all, 0.0)
    l2 = jnp.concatenate([l_row, l_row])           # value by opposing slot
    minv = jnp.where(accept & (e_bot[:, None] & top_half[None, :]),
                     l2[None, :], minv)
    minv = jnp.where(accept & (top_half[:, None] & e_bot[None, :]),
                     l2[:, None], minv)

    mdense, info = _factor_minv(minv, base.theta, m, middle_solve)
    # Latch: once any factorization in this history's lifetime failed,
    # info stays set (a matrix reset builds a fresh history and clears it).
    return BHistory(base=base, minv=minv, mdense=mdense,
                    info=jnp.maximum(bh.info, info))


# ---------------------------------------------------------------------------
# The W/M operator family (BFGSMat.h:304-615).  All [2m] vectors use the
# slot layout [y-part; s-part]; invalid slots carry zeros.
# ---------------------------------------------------------------------------

def apply_wtv(bh: BHistory, v: Array,
              axis_name: Optional[str] = None) -> Array:
    """``W'v`` with ``W = [Y, theta*S]`` (BFGSMat::apply_Wtv,
    BFGSMat.h:315-320).  Both matvecs ride one collective."""
    m = bh.m
    stacked = jnp.concatenate([bh.base.y, bh.base.s], axis=0)   # [2m, n]
    res = coll.pmatvec(stacked, v, axis_name)
    return res.at[m:].multiply(bh.theta)


def apply_mv(bh: BHistory, v: Array) -> Array:
    """``M v`` on a [2m] slot-layout vector (BFGSMat::apply_Mv,
    BFGSMat.h:361-376).  Identity padding keeps invalid slots at zero."""
    return bh.mdense @ v


def w_matvec(bh: BHistory, v2m: Array) -> Array:
    """``W v2m`` mapping [2m] -> [n] with ``W = [Y, theta*S]``."""
    m = bh.m
    vy = v2m[:m]
    vs = v2m[m:] * bh.theta
    return jnp.einsum("mn,m->n", bh.base.y, vy,
                      precision=lax.Precision.HIGHEST) + \
        jnp.einsum("mn,m->n", bh.base.s, vs,
                   precision=lax.Precision.HIGHEST)


def apply_wtpv(bh: BHistory, mask: Array, v: Array,
               axis_name: Optional[str] = None) -> Array:
    """``W'(P v)`` where P selects the coordinates in ``mask``
    (BFGSMat::apply_WtPv, BFGSMat.h:382-430): a masked :func:`apply_wtv`."""
    return apply_wtv(bh, jnp.where(mask, v, 0.0), axis_name)


def apply_ptwmv(bh: BHistory, mask: Array, v2m: Array, scale) -> Array:
    """``scale * P'(W M v)`` mapping [2m] -> [n] masked by P
    (BFGSMat::apply_PtWMv, BFGSMat.h:435-478)."""
    mv = apply_mv(bh, v2m)
    res = w_matvec(bh, mv)
    return jnp.where(mask, scale * res, 0.0)


def compute_ftbab(bh: BHistory, free_mask: Array, act_mask: Array,
                  wd: Array, drt: Array,
                  axis_name: Optional[str] = None) -> Array:
    """``F'BAb = -(F'W) M (W'AA'd)`` (BFGSMat::compute_FtBAb,
    BFGSMat.h:486-522), with A = new-active mask and F = free mask.

    The reference chooses between two algebraically equal routes based on
    sparsity; with masks one masked matvec covers both."""
    rhs = apply_wtpv(bh, act_mask, drt, axis_name)
    return apply_ptwmv(bh, free_mask, rhs, -1.0)


def solve_ptbp(bh: BHistory, mask: Array, v: Array,
               axis_name: Optional[str] = None,
               middle_solve=None):
    """``inv(P'BP) v`` on the masked coordinates (BFGSMat::solve_PtBP,
    BFGSMat.h:529-565):

        inv(P'BP) v = v/theta + WP inv(inv(M) - WP'WP/theta) WP' v / theta^2

    The 2m x 2m "mid" matrix is built from ``minv`` minus the Gram matrices of
    the P-masked W rows and factorized fresh per call (reference builds a new
    BKLDLT, BFGSMat.h:558).  Identity padding decouples invalid slots.
    Returns ``(res, info)`` — info > 0 flags a failed/zero pivot in this
    call's fresh factorization (the reference ignores it, BFGSMat.h:558)."""
    m = bh.m
    theta = bh.theta

    ym = jnp.where(mask, bh.base.y, 0.0)           # [m, n] masked rows
    sm = jnp.where(mask, bh.base.s, 0.0)
    stacked = jnp.concatenate([ym, sm], axis=0)    # [2m, n]
    gram = coll.pgram(stacked, axis_name)          # [2m, 2m]
    g_yy = gram[:m, :m]
    g_sy = gram[m:, :m]
    g_ss = gram[m:, m:]

    mid_tl = bh.minv[:m, :m] - g_yy / theta
    mid_bl = bh.minv[m:, :m] - g_sy
    mid_br = theta * (bh.minv[m:, m:] - g_ss)
    mid = jnp.block([[mid_tl, mid_bl.T], [mid_bl, mid_br]])

    wpv = coll.pmatvec(stacked, jnp.where(mask, v, 0.0), axis_name)
    wpv = wpv.at[m:].multiply(theta)
    z, info = _sym_solve(mid, wpv, middle_solve)
    z = z.at[m:].multiply(theta)
    # WP @ z with *raw* S rows (theta is carried in z's s-part, as in the
    # reference where WP omits the theta factor, BFGSMat.h:540, :560-564).
    wz = jnp.einsum("mn,m->n", bh.base.y, z[:m],
                    precision=lax.Precision.HIGHEST) + \
        jnp.einsum("mn,m->n", bh.base.s, z[m:],
                   precision=lax.Precision.HIGHEST)
    res = v / theta + wz / (theta * theta)
    return jnp.where(mask, res, 0.0), info


def apply_ptbqv(bh: BHistory, p_mask: Array, q_mask: Array, v: Array,
                axis_name: Optional[str] = None) -> Array:
    """``P'BQv = -WP M WQ' v`` for disjoint masks P, Q
    (BFGSMat::apply_PtBQv, BFGSMat.h:570-615)."""
    rhs = apply_wtpv(bh, q_mask, v, axis_name)
    mv = apply_mv(bh, rhs)
    res = w_matvec(bh, mv)
    return jnp.where(p_mask, -res, 0.0)


def w_rows(bh: BHistory) -> Array:
    """All rows of W as [n, 2m] (coordinate order, no gather) — the same
    W-row semantics as ``Wb`` (BFGSMat.h:325-335) materialized for every
    coordinate at once; the prefix-GCP path consumes them through a
    one-hot permutation matmul."""
    return jnp.concatenate([bh.base.y.T, bh.base.s.T * bh.theta], axis=1)


def w_columns(bh: BHistory, idx: Array) -> Array:
    """Rows of W gathered at coordinate indices ``idx`` -> [len(idx), 2m]
    (``Wb``, BFGSMat.h:325-335), used to pre-gather the GCP scan inputs."""
    m = bh.m
    ycols = bh.base.y[:, idx].T                    # [k, m]
    scols = bh.base.s[:, idx].T * bh.theta
    return jnp.concatenate([ycols, scols], axis=1)
