"""Subspace minimization (BOXCQP) with masked active sets.

TPU-native re-design of the reference's ``SubspaceMin`` class
(/root/reference/include/LBFGSpp/SubspaceMin.h:122-302): an exact
bound-constrained QP over the free variables via the primal-dual active-set
method of Voglis & Lagaris (BOXCQP), departing from classical L-BFGS-B just
like the reference does (SubspaceMin.h:25-31).

Re-expression for fixed shapes: the reference's dynamically sized index sets
(L/U/P over the free variables, SubspaceMin.h:183-219) become boolean [n]
masks and every subvector solve becomes a full-size masked operation through
the W/M operator family in :mod:`.bmat`:

* the L/U/P partition tests, including the exact tie-breaking on
  ``y == l && lambda >= 0`` / ``y == u && mu >= 0`` (SubspaceMin.h:198-218),
  act elementwise on full vectors;
* ``solve_PtBP`` over the P set is a masked 2m x 2m bordered solve;
* convergence of the three sets (SubspaceMin.h:72-108) is a pair of masked
  ``all`` reductions;
* the iteration cap ``max_submin`` and the 3-level fallback on
  non-convergence — projection, projected unconstrained, unconstrained
  (SubspaceMin.h:277-295) — are preserved exactly, with the same
  machine-epsilon descent tests.

The loop is a ``lax.while_loop`` so the whole subspace phase nests inside the
solver's outer while loop under ``jit``/``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..parallel import collectives as coll
from . import bmat

Array = jax.Array


class _Carry(NamedTuple):
    y: Array        # [n] iterate on free coords (zero elsewhere)
    lam: Array      # [n] lower-bound multipliers
    mu: Array       # [n] upper-bound multipliers
    k: Array        # int32 iteration counter
    converged: Array
    info: Array     # int32, latched factorization status across iterations


def subspace_minimize(bh: bmat.BHistory, x0: Array, xcp: Array, g: Array,
                      lb: Array, ub: Array, wd: Array,
                      newact_mask: Array, free_mask: Array,
                      maxit: int,
                      axis_name: Optional[str] = None,
                      unroll: bool = False,
                      middle_solve=None):
    """Return ``(drt, info)`` where ``drt = xsm - x0`` is the search
    direction (SubspaceMin::subspace_minimize, SubspaceMin.h:122-302) and
    ``info > 0`` flags a failed middle-matrix factorization in any of this
    call's ``solve_PtBP`` solves (observability only — the reference
    ignores factorization status, BFGSMat.h:558, and both rely on the
    3-level fallback + the driver's pathological-direction rescue).

    ``unroll=True`` replaces the active-set ``lax.while_loop`` with
    ``maxit`` statically unrolled iterations whose converged instances are
    frozen by selects — identical values (the freeze mirrors the loop
    exit), but one fused XLA computation instead of a nested sequential
    loop, which is what the batched (vmap) box solver wants.

    ``middle_solve`` routes every ``solve_PtBP`` middle-matrix system:
    ``"gj"`` (Gauss-Jordan, default) or ``"bkldlt"`` (the reference's
    Bunch-Kaufman LDL', BFGSMat.h:558)."""
    dtype = x0.dtype
    eps = jnp.finfo(dtype).eps
    theta = bh.theta

    drt0 = xcp - x0
    nfree = coll.psum_scalar(jnp.sum(free_mask.astype(jnp.int32)),
                             axis_name)
    any_free = nfree >= 1

    # Linear term c = F'BAb + F'g and shifted bounds (SubspaceMin.h:146-156).
    vecc = bmat.compute_ftbab(bh, free_mask, newact_mask, wd, drt0,
                              axis_name)
    vecc = jnp.where(free_mask, vecc + g, 0.0)
    vecl = jnp.where(free_mask, lb - x0, 0.0)
    vecu = jnp.where(free_mask, ub - x0, 0.0)

    # Unconstrained solve y = -inv(B[F, F]) c (SubspaceMin.h:157-159).
    y0, info0 = bmat.solve_ptbp(bh, free_mask, -vecc, axis_name,
                                middle_solve)

    # Feasibility shortcut (SubspaceMin.h:160-166).
    feasible = coll.pall(
        jnp.all(jnp.where(free_mask, (y0 >= vecl) & (y0 <= vecu), True)),
        axis_name)

    yfallback = y0

    def cond(c: _Carry):
        return (~c.converged) & (c.k < maxit)

    def body(c: _Carry) -> _Carry:
        # L/U/P partition with exact boundary tie-breaking
        # (SubspaceMin.h:194-219).
        l_set = free_mask & ((c.y < vecl) |
                             ((c.y == vecl) & (c.lam >= 0.0)))
        u_set = free_mask & (~l_set) & ((c.y > vecu) |
                                        ((c.y == vecu) & (c.mu >= 0.0)))
        p_set = free_mask & (~l_set) & (~u_set)

        y = jnp.where(l_set, vecl, jnp.where(u_set, vecu, c.y))
        lam = jnp.where(u_set | p_set, 0.0, c.lam)
        mu = jnp.where(l_set | p_set, 0.0, c.mu)

        # y[P] = -inv(B[P,P]) (B[P,L] l + B[P,U] u + c[P])
        # (SubspaceMin.h:226-245).
        rhs = jnp.where(p_set, vecc, 0.0)
        rhs = rhs + bmat.apply_ptbqv(bh, p_set, l_set, vecl, axis_name)
        rhs = rhs + bmat.apply_ptbqv(bh, p_set, u_set, vecu, axis_name)
        yp, info_p = bmat.solve_ptbp(bh, p_set, -rhs, axis_name,
                                     middle_solve)
        y = jnp.where(p_set, yp, y)

        # Multipliers: lambda[L] = B[L,F] y + c[L]; mu[U] = -B[U,F] y - c[U]
        # (SubspaceMin.h:247-268).  B[Q,F] y = theta*y[Q] - (Q'W M W'F) y
        # for Q in {L, U} since Q is a subset of F.
        fy = bmat.apply_wtpv(bh, free_mask, y, axis_name)
        wm_l = bmat.apply_ptwmv(bh, l_set, fy, -1.0)
        lam = jnp.where(l_set, wm_l + vecc + theta * y, lam)
        wm_u = bmat.apply_ptwmv(bh, u_set, fy, -1.0)
        mu = jnp.where(u_set, -(wm_u + vecc + theta * y), mu)

        # Convergence of the three sets (SubspaceMin.h:271-272); one
        # fused global AND when sharded.
        conv = coll.pall(
            jnp.all(jnp.where(l_set, lam >= 0.0, True)) &
            jnp.all(jnp.where(u_set, mu >= 0.0, True)) &
            jnp.all(jnp.where(p_set, (y >= vecl) & (y <= vecu), True)),
            axis_name)

        return _Carry(y=y, lam=lam, mu=mu, k=c.k + 1, converged=conv,
                      info=jnp.maximum(c.info, info_p))

    lam0 = jnp.zeros_like(y0)
    mu0 = jnp.zeros_like(y0)
    if axis_name is not None:
        # Zero initializers are shard-invariant; the loop body overwrites
        # them with shard-local data (shard_map varying-type system).
        lam0 = coll.pvary(lam0, axis_name)
        mu0 = coll.pvary(mu0, axis_name)
    init = _Carry(y=y0, lam=lam0, mu=mu0,
                  k=jnp.zeros((), jnp.int32),
                  converged=jnp.zeros((), bool),
                  info=info0)
    run_loop = any_free & (~feasible)
    # Skip the loop entirely when the shortcut fired (converged=True seeds).
    init = init._replace(converged=~run_loop)
    if unroll:
        out = init
        for _ in range(maxit):
            nxt = body(out)
            out = jax.tree.map(
                lambda a, b: jnp.where(cond(out), b, a), out, nxt)
    else:
        out = lax.while_loop(cond, body, init)

    # 3-level fallback when the iterations did not converge
    # (SubspaceMin.h:276-296).
    failed = run_loop & (~out.converged)
    y_proj = jnp.clip(out.y, vecl, vecu)
    drt_a = jnp.where(free_mask, y_proj, drt0)
    dg_a = coll.pdot(drt_a, g, axis_name)
    fb_proj = jnp.clip(yfallback, vecl, vecu)
    drt_b = jnp.where(free_mask, fb_proj, drt0)
    dg_b = coll.pdot(drt_b, g, axis_name)
    drt_c = jnp.where(free_mask, yfallback, drt0)
    drt_failed = jnp.where(dg_a <= -eps, drt_a,
                           jnp.where(dg_b <= -eps, drt_b, drt_c))

    drt_ok = jnp.where(free_mask, out.y, drt0)
    drt = jnp.where(failed, drt_failed, drt_ok)
    return jnp.where(any_free, drt, drt0), out.info
