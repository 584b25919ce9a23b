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
    xcp: Array         # [n] generalized Cauchy point
    vecc: Array        # [2m] c = W'(xcp - x0), slot layout
    newact_mask: Array  # [n] coordinates that became active during the walk
    free_mask: Array   # [n] free-variable set


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
    eps = jnp.finfo(dtype).eps
    theta = bh.theta

    # --- Break points and initial direction (Cauchy.h:111-129) ---
    pinned = lb == ub
    brk = jnp.where(
        pinned, 0.0,
        jnp.where(g < 0.0, (x0 - ub) / g,
                  jnp.where(g > 0.0, (x0 - lb) / g, inf)))
    iszero = brk == 0.0
    vecd = jnp.where(iszero, 0.0, -g)
    free0 = brk == inf
    participates = (~free0) & (~iszero)
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

        crossf = cross.astype(dtype)
        vecc = c.vecc + crossf * deltat * c.vecp
        fp = c.fp + crossf * deltat * c.fpp

        # Per-coordinate updates (Cauchy.h:219-234)
        cache = mdense @ w_t               # M w
        gg = g_t * g_t
        fp = fp + crossf * (gg + theta * g_t * z_t - g_t * (cache @ vecc))
        fpp = c.fpp - crossf * (theta * gg + 2.0 * g_t * (cache @ c.vecp) +
                                gg * (cache @ w_t))
        vecp = c.vecp + crossf * g_t * w_t
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

    # fpp ~ 0 rescue (Cauchy.h:258-262)
    deltatmin = jnp.where(out.fpp < eps, -out.fp / eps, -out.fp / out.fpp)
    deltatmin = jnp.maximum(deltatmin, 0.0)
    tfinal = out.il + deltatmin

    # Final extension on free + uncrossed coordinates (Cauchy.h:264-282)
    vecc = jnp.where(crossed_all, out.vecc, out.vecc + deltatmin * out.vecp)
    free_mask = free0 | (participates & (~crossed))
    xcp = jnp.where(crossed, jnp.where(vecd > 0.0, ub, lb), x0)
    extend = free_mask & (~crossed_all)
    xcp = jnp.where(extend, x0 + tfinal * vecd, xcp)

    return CauchyResult(xcp=xcp, vecc=vecc, newact_mask=crossed,
                        free_mask=free_mask)
