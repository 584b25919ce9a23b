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
    """

    s: Array       # [m, n] correction s-vectors (rows, ring order)
    y: Array       # [m, n] correction y-vectors
    ys: Array      # [m]    s'y per slot (BFGSMat.h:39)
    theta: Array   # scalar, B0 = theta * I scaling (BFGSMat.h:36)
    ncorr: Array   # int32 scalar, number of valid corrections (<= m)
    ptr: Array     # int32 scalar, ring pointer in [1, m], init m
                   # (BFGSMat.h:70: first write lands at slot ptr % m == 0)

    @property
    def m(self) -> int:
        return self.s.shape[0]


def init_history(n: int, m: int, dtype=jnp.float32) -> LBFGSHistory:
    """Fresh history (BFGSMat::reset, BFGSMat.h:61-78)."""
    return LBFGSHistory(
        s=jnp.zeros((m, n), dtype),
        y=jnp.zeros((m, n), dtype),
        ys=jnp.zeros((m,), dtype),
        theta=jnp.ones((), dtype),
        ncorr=jnp.zeros((), jnp.int32),
        ptr=jnp.asarray(m, jnp.int32),
    )


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
    m = hist.m
    loc = hist.ptr % m

    ys, yy = coll.pdot2(s, y, y, y, axis_name)

    s_row = jnp.where(accept, s, lax.dynamic_index_in_dim(hist.s, loc, 0,
                                                          keepdims=False))
    y_row = jnp.where(accept, y, lax.dynamic_index_in_dim(hist.y, loc, 0,
                                                          keepdims=False))
    new_s = lax.dynamic_update_index_in_dim(hist.s, s_row, loc, 0)
    new_y = lax.dynamic_update_index_in_dim(hist.y, y_row, loc, 0)
    new_ys = jnp.where(accept, hist.ys.at[loc].set(ys), hist.ys)
    new_theta = jnp.where(accept, yy / ys, hist.theta)
    new_ncorr = jnp.where(accept, jnp.minimum(hist.ncorr + 1, m), hist.ncorr)
    new_ptr = jnp.where(accept, (loc + 1).astype(jnp.int32), hist.ptr)

    return LBFGSHistory(new_s, new_y, new_ys, new_theta, new_ncorr, new_ptr)


def apply_hv(hist: LBFGSHistory, v: Array, a,
             axis_name: Optional[str] = None) -> Array:
    """Two-loop recursion computing ``a * H * v`` (BFGSMat.h:276-302;
    Nocedal & Wright Alg. 7.4).

    The m-loop is unrolled at trace time (m is small and static, default 6) —
    each step is one global dot + one axpy over the sharded vector, so the
    sequential dependence costs 2m collectives per call when sharded; within a
    chip XLA fuses each dot+axpy pair over a single HBM pass.
    """
    m = hist.m
    dtype = v.dtype
    res = jnp.asarray(a, dtype) * v

    # Loop 1: newest -> oldest (BFGSMat.h:284-290)
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

    # Apply H0 = I / theta (BFGSMat.h:292-293)
    res = res / hist.theta

    # Loop 2: oldest -> newest (BFGSMat.h:296-301)
    for i in reversed(range(m)):
        sj, yj, ysj_safe, active = rows[i]
        beta = jnp.where(active, coll.pdot(yj, res, axis_name) / ysj_safe,
                         jnp.zeros((), dtype))
        res = res + (alphas[i] - beta) * sj
    return res


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
