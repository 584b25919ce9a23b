"""Cross-shard reduction primitives.

The reference is a single-address-space library: every inner product / norm is
an Eigen reduction over the whole vector (e.g. ``grad.dot(drt)`` LBFGS.h:123,
``m_s.col(j).dot(res)`` BFGSMat.h:288, ``m_grad.norm()`` LBFGS.h:92).  In the
TPU design the parameter vector may be sharded over a 1-D device mesh, and
each of those reductions becomes *local compute + one collective*.  All solver
and kernel code funnels its reductions through these helpers; passing
``axis_name=None`` gives the single-device semantics, passing a mesh axis name
(under ``shard_map``/``pjit``) turns each into ``lax.psum``/``pmax``/``pmin``
over ICI.

No other communication exists in the solver: the m-dim / 2m-dim quantities
(``ys``, ``theta``, the middle matrix) are replicated, exactly as identified
in SURVEY.md §5.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def psum_scalar(x: Array, axis_name: Optional[str]) -> Array:
    return lax.psum(x, axis_name) if axis_name is not None else x


def pvary(x: Array, axis_name: Optional[str]) -> Array:
    """Mark a shard-invariant value as device-varying for shard_map's
    varying-axes type system.  Needed for carry initializers (e.g. the
    zeroed history matrices) that a while_loop body overwrites with
    shard-local data."""
    if axis_name is None:
        return x
    try:
        already_varying = axis_name in jax.typeof(x).vma
    except AttributeError:     # outside shard_map's manual context
        return x
    if already_varying:
        return x
    return lax.pcast(x, (axis_name,), to="varying")


def pdot(a: Array, b: Array, axis_name: Optional[str] = None) -> Array:
    """Global inner product a.b (Eigen ``a.dot(b)``)."""
    return psum_scalar(jnp.dot(a, b, precision=lax.Precision.HIGHEST),
                       axis_name)


def psqnorm(a: Array, axis_name: Optional[str] = None) -> Array:
    """Global squared Euclidean norm (Eigen ``a.squaredNorm()``)."""
    return pdot(a, a, axis_name)


def pnorm(a: Array, axis_name: Optional[str] = None) -> Array:
    """Global Euclidean norm (Eigen ``a.norm()``)."""
    return jnp.sqrt(psqnorm(a, axis_name))


def pmax(x: Array, axis_name: Optional[str] = None) -> Array:
    """Global max of a local scalar."""
    return lax.pmax(x, axis_name) if axis_name is not None else x


def pmin(x: Array, axis_name: Optional[str] = None) -> Array:
    """Global min of a local scalar."""
    return lax.pmin(x, axis_name) if axis_name is not None else x


def pall(x: Array, axis_name: Optional[str] = None) -> Array:
    """Global logical AND of a local boolean scalar (used by the masked
    set-convergence tests of BOXCQP, SubspaceMin.h:72-108, when the
    coordinate masks are feature-sharded)."""
    if axis_name is None:
        return x
    return pmin(x.astype(jnp.int32), axis_name) == 1


def pmax_abs(a: Array, axis_name: Optional[str] = None) -> Array:
    """Global infinity norm (Eigen ``.cwiseAbs().maxCoeff()``,
    LBFGSB.h:62-65)."""
    return pmax(jnp.max(jnp.abs(a)), axis_name)


def pdot2(a1: Array, b1: Array, a2: Array, b2: Array,
          axis_name: Optional[str] = None) -> tuple:
    """Two inner products fused into a single collective.

    Used for the curvature gate ``s'y`` and ``y'y`` (LBFGS.h:161): under
    sharding both reductions ride one length-2 ``psum``.
    """
    d1 = jnp.dot(a1, b1, precision=lax.Precision.HIGHEST)
    d2 = jnp.dot(a2, b2, precision=lax.Precision.HIGHEST)
    if axis_name is None:
        return d1, d2
    s = lax.psum(jnp.stack([d1, d2]), axis_name)
    return s[0], s[1]


def pmatvec(mat: Array, v: Array, axis_name: Optional[str] = None) -> Array:
    """Global ``mat @ v`` where ``mat`` is [m, n_local] and ``v`` is
    [n_local]: m inner products fused into one collective.  Used for the
    S'v / Y'v families (BFGSMat.h:315-320)."""
    local = jnp.einsum("mn,n->m", mat, v, precision=lax.Precision.HIGHEST)
    return lax.psum(local, axis_name) if axis_name is not None else local


def pgram(mat: Array, axis_name: Optional[str] = None) -> Array:
    """Global Gram matrix ``mat @ mat.T`` of a [k, n_local] matrix: the k^2
    reductions ride one collective.  Used for the masked ``WP'WP`` blocks of
    ``solve_PtBP`` (BFGSMat.h:541-556)."""
    local = jnp.einsum("an,bn->ab", mat, mat,
                       precision=lax.Precision.HIGHEST)
    return lax.psum(local, axis_name) if axis_name is not None else local
