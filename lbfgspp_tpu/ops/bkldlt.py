"""Bunch-Kaufman LDL' factorization for small symmetric (possibly indefinite)
matrices, as fixed-shape JAX.

TPU re-design of the reference's ``BKLDLT`` class
(/root/reference/include/LBFGSpp/BKLDLT.h): 1x1 / 2x2 diagonal pivoting with
the alpha = (1 + sqrt(17)) / 8 test cascade (BKLDLT.h:406, :233-299), used to
solve the 2m x 2m "middle matrix" systems of the L-BFGS-B W/M operator family
(BFGSMat.h:52, :143-145, :558).

Differences from the reference dictated by the programming model:

* dense [n, n] storage instead of packed lower-triangular + column pointers —
  n is 2m (= 12 by default), so the working set is tiny and lives in
  registers/VMEM; a dense representation keeps every update a masked
  outer-product, which is vmap-friendly (batched solves share one program);
* the factor L and the active submatrix are kept in *separate* arrays rather
  than sharing a packed triangle, making the row/column interchanges simple
  symmetric row+col swaps;
* the permutation is stored as the reference's ``m_perm`` array (entry k = the
  row interchanged with k) plus an int8 pivot-type vector (1 = 1x1 pivot,
  2 = first half of a 2x2 pivot, 0 = second half) replacing the reference's
  negative-index encoding (BKLDLT.h:157-160);
* ``compute``/``solve`` are pure functions over a :class:`BKFactors` pytree;
  the NUMERICAL_ISSUE status (BKLDLT.h:15-20) is carried as ``info``.

Everything is ``lax.fori_loop`` over the (static) dimension with masked
updates — no data-dependent shapes — so the factorization can sit inside the
solver's ``lax.while_loop`` and under ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

SUCCESSFUL = 0
NUMERICAL_ISSUE = 2


class BKFactors(NamedTuple):
    """Factorization P A P' = L D L'.

    ``lmat`` stores L strictly below the diagonal of each pivot column and the
    *inverted* D blocks on/near the diagonal (the reference stores inv(D) in
    place, BKLDLT.h:325, :353): for a 1x1 pivot at k, ``lmat[k, k] = 1/d``;
    for a 2x2 pivot at k, ``lmat[k, k], lmat[k+1, k], lmat[k+1, k+1]`` hold
    the inverse of the 2x2 block.
    """

    lmat: Array    # [n, n]
    perm: Array    # [n] int32: row interchanged with k at step k
    ptype: Array   # [n] int8: 1 = 1x1, 2 = 2x2 head, 0 = 2x2 tail
    info: Array    # int32 status


def _swap_rows_cols(a: Array, i, j) -> Array:
    """Symmetric interchange of rows and columns i <-> j of a full matrix."""
    n = a.shape[0]
    idx = jnp.arange(n)
    swapped = jnp.where(idx == i, j, jnp.where(idx == j, i, idx))
    return a[swapped][:, swapped]


def _swap_rows_upto(a: Array, i, j, upto) -> Array:
    """Swap rows i <-> j of ``a`` restricted to columns < upto
    (the reference's ``interchange_rows`` on the L part, BKLDLT.h:165-174)."""
    cols = jnp.arange(a.shape[1])
    mask = cols < upto
    row_i = a[i]
    row_j = a[j]
    a = a.at[i].set(jnp.where(mask, row_j, row_i))
    a = a.at[j].set(jnp.where(mask, row_i, row_j))
    return a


def compute(a: Array) -> BKFactors:
    """Factorize the symmetric matrix ``a`` (BKLDLT::compute,
    BKLDLT.h:390-441).  Only the lower triangle of ``a`` is referenced."""
    n = a.shape[0]
    dtype = a.dtype
    # Work on the full symmetric matrix built from the lower triangle.
    awork = jnp.tril(a) + jnp.tril(a, -1).T
    lmat = jnp.zeros((n, n), dtype)
    perm = jnp.arange(n, dtype=jnp.int32)
    ptype = jnp.ones((n,), jnp.int8)
    alpha = (1.0 + jnp.sqrt(jnp.asarray(17.0, dtype))) / 8.0
    rows = jnp.arange(n)

    def masked_col(mat, k, lo):
        """Column k of mat with rows < lo zeroed."""
        return jnp.where(rows >= lo, mat[:, k], 0.0)

    def body(k, carry):
        awork, lmat, perm, ptype, info, skip = carry

        # ---- Pivot selection (permutate_mat, BKLDLT.h:233-300) ----
        colk = jnp.abs(masked_col(awork, k, k + 1))
        r = jnp.argmax(colk).astype(jnp.int32)
        lam = colk[r]
        abs_akk = jnp.abs(awork[k, k])

        # sigma = max off-diagonal magnitude in column r of the reduced
        # matrix (excluding A[r, r]) — find_sigma, BKLDLT.h:207-229.
        colr = jnp.abs(jnp.where((rows >= k) & (rows != r), awork[:, r], 0.0))
        p = jnp.argmax(colr).astype(jnp.int32)
        sigma = colr[p]

        no_interchange = (lam == 0.0) | (abs_akk >= alpha * lam) | \
            (sigma * abs_akk >= alpha * lam * lam)
        do_1x1_swap = (~no_interchange) & (abs_akk >= alpha * sigma)
        do_2x2 = (~no_interchange) & (~do_1x1_swap)

        # ---- Apply interchanges ----
        def apply_1x1(args):
            awork, lmat = args
            return _swap_rows_cols(awork, k, r), _swap_rows_upto(lmat, k, r, k)

        def apply_2x2(args):
            # Version 1 of the reference (p = k, BKLDLT.h:269-292):
            # interchange (k+1) <-> r only.
            awork, lmat = args
            return (_swap_rows_cols(awork, k + 1, r),
                    _swap_rows_upto(lmat, k + 1, r, k))

        awork, lmat = lax.cond(do_1x1_swap, apply_1x1,
                               lambda args: lax.cond(do_2x2, apply_2x2,
                                                     lambda x: x, args),
                               (awork, lmat))
        perm = jnp.where(do_1x1_swap, perm.at[k].set(r), perm)
        perm = jnp.where(do_2x2, perm.at[k + 1].set(r), perm)
        is_2x2 = do_2x2

        # ---- Elimination ----
        def elim_1x1(args):
            awork, lmat, info = args
            akk = awork[k, k]
            bad = akk == 0.0
            akk_safe = jnp.where(bad, jnp.ones((), dtype), akk)
            l_col = jnp.where(rows > k, awork[:, k], 0.0)
            upd = jnp.outer(l_col, l_col) / akk_safe
            awork = awork - upd
            lmat = lmat.at[:, k].set(
                jnp.where(rows > k, l_col / akk_safe, lmat[:, k]))
            lmat = lmat.at[k, k].set(1.0 / akk_safe)
            info = jnp.where(bad, jnp.int32(NUMERICAL_ISSUE), info)
            return awork, lmat, info

        def elim_2x2(args):
            awork, lmat, info = args
            e11 = awork[k, k]
            e21 = awork[k + 1, k]
            e22 = awork[k + 1, k + 1]
            delta = e11 * e22 - e21 * e21
            bad = delta == 0.0
            delta_safe = jnp.where(bad, jnp.ones((), dtype), delta)
            d11 = e22 / delta_safe
            d22 = e11 / delta_safe
            d21 = -e21 / delta_safe
            l1 = jnp.where(rows > k + 1, awork[:, k], 0.0)
            l2 = jnp.where(rows > k + 1, awork[:, k + 1], 0.0)
            x1 = l1 * d11 + l2 * d21
            x2 = l1 * d21 + l2 * d22
            awork = awork - jnp.outer(x1, l1) - jnp.outer(x2, l2)
            lmat = lmat.at[:, k].set(jnp.where(rows > k + 1, x1, lmat[:, k]))
            lmat = lmat.at[:, k + 1].set(
                jnp.where(rows > k + 1, x2, lmat[:, k + 1]))
            lmat = lmat.at[k, k].set(d11)
            lmat = lmat.at[k + 1, k].set(d21)
            lmat = lmat.at[k + 1, k + 1].set(d22)
            info = jnp.where(bad, jnp.int32(NUMERICAL_ISSUE), info)
            return awork, lmat, info

        last = k == n - 1

        def elim_last(args):
            # Invert the trailing 1x1 block (BKLDLT.h:429-436).
            awork, lmat, info = args
            akk = awork[k, k]
            bad = akk == 0.0
            akk_safe = jnp.where(bad, jnp.ones((), dtype), akk)
            lmat = lmat.at[k, k].set(1.0 / akk_safe)
            info = jnp.where(bad, jnp.int32(NUMERICAL_ISSUE), info)
            return awork, lmat, info

        def run(args):
            return lax.cond(last, elim_last,
                            lambda a: lax.cond(is_2x2, elim_2x2, elim_1x1, a),
                            args)

        awork, lmat, info = lax.cond(skip, lambda a: a, run,
                                     (awork, lmat, info))

        ptype = jnp.where(skip, ptype,
                          jnp.where(is_2x2,
                                    ptype.at[k].set(jnp.int8(2))
                                    .at[k + 1].set(jnp.int8(0)),
                                    ptype))
        next_skip = (~skip) & is_2x2
        return awork, lmat, perm, ptype, info, next_skip

    init = (awork, lmat, perm, ptype, jnp.int32(SUCCESSFUL),
            jnp.zeros((), bool))
    awork, lmat, perm, ptype, info, _ = lax.fori_loop(0, n, body, init)
    return BKFactors(lmat=lmat, perm=perm, ptype=ptype, info=info)


def solve(fac: BKFactors, b: Array) -> Array:
    """Solve ``A x = b`` from the factors (BKLDLT::solve_inplace,
    BKLDLT.h:444-520): Pb -> Lz = Pb -> Dw = z -> L'y = w -> x = P'y."""
    n = fac.lmat.shape[0]
    rows = jnp.arange(n)
    lmat, perm, ptype = fac.lmat, fac.perm, fac.ptype

    # 1. b -> Pb: apply interchanges in forward order (BKLDLT.h:451-457).
    def perm_fwd(i, x):
        j = perm[i]
        xi, xj = x[i], x[j]
        return x.at[i].set(xj).at[j].set(xi)

    x = lax.fori_loop(0, n, perm_fwd, b)

    # 2. Lz = Pb, forward substitution by pivot blocks (BKLDLT.h:459-478).
    def lsolve(i, x):
        is_head = ptype[i] != 0

        def one(x):
            l_col = jnp.where(rows > i, lmat[:, i], 0.0)
            return x - l_col * x[i]

        def two(x):
            # 2x2 head: both columns' L rows start at i+2
            l1 = jnp.where(rows > i + 1, lmat[:, i], 0.0)
            l2 = jnp.where(rows > i + 1,
                           lmat[:, jnp.minimum(i + 1, n - 1)], 0.0)
            return x - l1 * x[i] - l2 * x[jnp.minimum(i + 1, n - 1)]

        return lax.cond(is_head & (ptype[i] == 2), two,
                        lambda x: lax.cond(is_head, one, lambda x: x, x), x)

    x = lax.fori_loop(0, n, lsolve, x)

    # 3. Dw = z with inverted D blocks (BKLDLT.h:480-496).
    def dsolve(i, x):
        head1 = ptype[i] == 1
        head2 = ptype[i] == 2

        def d1(x):
            return x.at[i].set(x[i] * lmat[i, i])

        def d2(x):
            i1 = jnp.minimum(i + 1, n - 1)
            e11 = lmat[i, i]
            e21 = lmat[i1, i]
            e22 = lmat[i1, i1]
            wi = x[i] * e11 + x[i1] * e21
            wi1 = x[i] * e21 + x[i1] * e22
            return x.at[i].set(wi).at[i1].set(wi1)

        return lax.cond(head2, d2,
                        lambda x: lax.cond(head1, d1, lambda x: x, x), x)

    x = lax.fori_loop(0, n, dsolve, x)

    # 4. L'y = w, backward substitution (BKLDLT.h:498-513).
    def ltsolve(t, x):
        i = n - 1 - t
        is_head = ptype[i] != 0

        def upd(x):
            l_col = jnp.where(rows > i, lmat[:, i], 0.0)
            return x.at[i].add(-jnp.dot(l_col, x))

        def upd2(x):
            # 2x2 head also collects the second column contribution into i+1?
            # No: for a 2x2 block at (i, i+1) the reference updates x[i+1]
            # with column i+1 and x[i] with column i, both over rows > i+1,
            # via the downward walk.  Column i's entry at row i+1 is zero in
            # lmat (L rows start at i+2), so the generic update is exact.
            return upd(x)

        return lax.cond(is_head, lambda x: lax.cond(ptype[i] == 2, upd2, upd,
                                                    x),
                        upd,  # 2x2 tail column also gets the generic update
                        x)

    x = lax.fori_loop(0, n, ltsolve, x)

    # 5. x = P'y: interchanges in reverse order (BKLDLT.h:515-519).
    def perm_bwd(t, x):
        i = n - 1 - t
        j = perm[i]
        xi, xj = x[i], x[j]
        return x.at[i].set(xj).at[j].set(xi)

    return lax.fori_loop(0, n, perm_bwd, x)
