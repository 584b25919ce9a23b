"""Feature-axis sharded solves over a device mesh.

The reference is a single-address-space library; scaling the parameter
dimension across devices is a greenfield capability mandated by the north
star (SURVEY.md §2, "Data/model sharding of x").  The design follows the
communication audit in SURVEY.md §5: the solver's only cross-shard data
dependencies are scalar reductions (dots, norms, the step_max min-reduce) and
the replicated [m]/[2m] quantities, so

* ``x``, ``g``, ``drt`` and the history rows ``s``/``y`` are sharded on a 1-D
  mesh over the feature axis,
* every reduction inside the solver goes through
  :mod:`.collectives` and becomes one ``lax.psum``/``pmin``/``pmax`` over ICI
  (DCN across slices rides the same collective),
* all scalar and [m]-sized state stays replicated.

The entry point wraps :func:`lbfgspp_tpu.lbfgs.minimize` (and the
box-constrained variant) in ``jax.shard_map``.  The user's objective is
written *locally*: it receives this device's shard of ``x`` and returns the
**partial** objective value (and optionally the local gradient shard); the
wrapper inserts the ``psum``.  Gradients of a partial objective are exact
because AD of ``psum(f_local)`` w.r.t. the local shard is local.

Example (separable quadratic, features sharded)::

    mesh = Mesh(np.asarray(jax.devices()), ("feat",))

    def local_fun(w_local):              # partial objective of this shard
        return jnp.sum((w_local - d_local) ** 2)

    res = minimize_sharded(local_fun, x0=w_global, mesh=mesh,
                           params=LBFGSParams())

For objectives that are not additively separable in the feature shards
(e.g. logistic regression where the logit is a dot over all features), pass
``local_fun_and_grad`` computing ``(fx_global, grad_local)`` with its own
collectives — see ``utils.objectives.make_sharded_logreg`` for the worked
pattern.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import LBFGSParams, LBFGSBParams
from ..types import SolveResult
from . import collectives as coll

Array = jax.Array

AXIS = "feat"


def _result_specs(axis: str, direction: str = "sweeps"):
    """PartitionSpec pytree for a SolveResult: vectors sharded on the feature
    axis, history matrices sharded on their minor axis, scalars replicated.
    ``direction="rinv"`` adds the replicated [m, m] ``rinv`` factor the
    throughput direction mode maintains."""
    from ..ops.history import LBFGSHistory
    vec = P(axis)
    rep = P()
    hist = LBFGSHistory(s=P(None, axis), y=P(None, axis), ys=rep,
                        theta=rep, ncorr=rep, ptr=rep, sy=rep, yy=rep,
                        rinv=rep if direction == "rinv" else None)
    return SolveResult(x=vec, fx=rep, grad=vec, gnorm=rep, niter=rep,
                       nfev=rep, status=rep, history=hist)


def make_sharded_fg(local_fun: Optional[Callable] = None,
                    local_fun_and_grad: Optional[Callable] = None,
                    axis_name: str = AXIS) -> Callable:
    """Build the solver-facing ``x_local -> (fx_global, grad_local)`` oracle
    from a *partial* local objective.

    ``local_fun(x_local) -> fx_partial`` must return this shard's additive
    contribution to the global objective (e.g. the sum over local features of
    a separable term).  The global value is ``psum`` of the partials, and the
    local gradient of the global objective equals the gradient of the local
    partial whenever the objective is additively separable across shards.

    For non-separable objectives pass ``local_fun_and_grad`` computing
    ``(fx_global, grad_local)`` directly with its own collectives.
    """
    if local_fun_and_grad is not None:
        return local_fun_and_grad
    if local_fun is None:
        raise ValueError("pass 'local_fun' or 'local_fun_and_grad'")

    def fg(x_local):
        fx_part, g_local = jax.value_and_grad(local_fun)(x_local)
        return coll.psum_scalar(fx_part, axis_name), g_local

    return fg


def minimize_sharded(local_fun: Optional[Callable] = None,
                     x0: Array = None,
                     params: LBFGSParams = LBFGSParams(),
                     *,
                     mesh: Optional[Mesh] = None,
                     axis_name: str = AXIS,
                     local_fun_and_grad: Optional[Callable] = None,
                     line_search: str = "nocedalwright",
                     direction: str = "sweeps",
                     history_dtype=None,
                     on_ls_fail: str = "stop") -> SolveResult:
    """L-BFGS with the parameter vector sharded over a 1-D mesh.

    ``x0`` is the global [n] vector (n divisible by the mesh size); the
    solve runs as one ``shard_map``-ped XLA program per device with exactly
    the collective sites audited in SURVEY.md §3.1 (||g||, g.d, the
    line-search directional derivatives, s'y & y'y fused into one psum, and
    the 2m dots of the two-loop recursion).  ``direction="rinv"`` selects
    the compact-form R^{-1} two-loop; its maintenance and application work
    entirely on the replicated [m]/[m, m] state (the feeding inner products
    already ride the fused psums), so the collective count per iteration is
    unchanged.  ``history_dtype`` (e.g. ``jnp.bfloat16``) stores the shard-
    local (s, y) rows at reduced precision — halves the dominant HBM
    streams for huge-n runs (see PERF.md "Mixed-precision history").
    """
    from ..lbfgs import minimize as _minimize

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
    fg = make_sharded_fg(local_fun, local_fun_and_grad, axis_name)

    def solve_local(x0_local):
        return _minimize(fun_and_grad=fg, x0=x0_local, params=params,
                         line_search=line_search, axis_name=axis_name,
                         direction=direction, history_dtype=history_dtype,
                         on_ls_fail=on_ls_fail)

    shmapped = jax.shard_map(solve_local, mesh=mesh,
                             in_specs=P(axis_name),
                             out_specs=_result_specs(axis_name, direction))
    return shmapped(x0)


def _result_specs_b(axis: str):
    from ..ops.history import LBFGSHistory
    from ..ops.bmat import BHistory
    vec = P(axis)
    rep = P()
    base = LBFGSHistory(s=P(None, axis), y=P(None, axis), ys=rep,
                        theta=rep, ncorr=rep, ptr=rep, sy=rep, yy=rep)
    hist = BHistory(base=base, minv=rep, mdense=rep, info=rep)
    return SolveResult(x=vec, fx=rep, grad=vec, gnorm=rep, niter=rep,
                       nfev=rep, status=rep, history=hist)


def minimize_b_sharded(local_fun: Optional[Callable] = None,
                       x0: Array = None,
                       lb: Array = None,
                       ub: Array = None,
                       params: Optional[LBFGSBParams] = None,
                       *,
                       mesh: Optional[Mesh] = None,
                       axis_name: str = AXIS,
                       local_fun_and_grad: Optional[Callable] = None,
                       line_search: str = "morethuente",
                       gcp: str = "auto",
                       middle_solve=None) -> SolveResult:
    """L-BFGS-B with the parameter vector (and its box bounds) sharded
    over a 1-D mesh.

    The reference's generalized-Cauchy-point phase sorts the break points
    of the whole coordinate vector (Cauchy.h:131-133) — impossible once
    ``x`` is feature-sharded.  This entry point routes the GCP through the
    sortless segment walk (:func:`..ops.cauchy.cauchy_point_walk`, 2
    collectives per crossed break-point group) and the mask-based BOXCQP
    whose reductions are all ``psum``/global-AND collectives, so huge-n
    *box-constrained* problems scale across devices exactly like the
    unconstrained solver.  ``local_fun`` follows the same partial-objective
    contract as :func:`minimize_sharded`; ``lb``/``ub`` are global [n]
    vectors sharded like ``x0``.  The default ``gcp="auto"`` routes each
    GCP call at runtime: the plain walk when few break points will be
    crossed (endgame iterations near the active set), ``walk_chunked``
    (up to 64 break-point values per round, 2 collectives per chunk
    instead of per value) when the estimated crossing count reaches the
    measured >= 16 threshold (cold interior starts cross ~all n) — see
    :func:`..ops.cauchy.cauchy_point_walk_auto` and the PERF.md round-5
    switchover table.  Pass ``gcp="walk"`` / ``"walk_chunked"`` to pin
    a variant.
    """
    from ..lbfgsb import minimize as _minimize_b

    if params is None:
        params = LBFGSBParams()
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
    fg = make_sharded_fg(local_fun, local_fun_and_grad, axis_name)

    def solve_local(x0_local, lb_local, ub_local):
        return _minimize_b(fun_and_grad=fg, x0=x0_local, lb=lb_local,
                           ub=ub_local, params=params,
                           line_search=line_search, axis_name=axis_name,
                           gcp=gcp, middle_solve=middle_solve)

    shmapped = jax.shard_map(solve_local, mesh=mesh,
                             in_specs=(P(axis_name), P(axis_name),
                                       P(axis_name)),
                             out_specs=_result_specs_b(axis_name))
    return shmapped(x0, jnp.asarray(lb), jnp.asarray(ub))


def minimize_owlqn_sharded(local_fun: Optional[Callable] = None,
                           x0: Array = None,
                           l1=None,
                           params: LBFGSParams = LBFGSParams(),
                           *,
                           mesh: Optional[Mesh] = None,
                           axis_name: str = AXIS,
                           local_fun_and_grad: Optional[Callable] = None
                           ) -> SolveResult:
    """OWL-QN (L1-regularized L-BFGS) with the parameter vector sharded.

    Same contract as :func:`minimize_sharded` for the smooth part
    (``local_fun`` returns this shard's additive partial loss); ``l1`` is a
    scalar or a global ``[n]`` weight vector (sharded like ``x0``).  The
    orthant machinery (pseudo-gradient, alignment, projection) is purely
    elementwise, so sharding adds only the scalar reductions: the L1-term
    psum rides the objective evaluation and the Armijo decrease / norms use
    the same collective sites as the unconstrained solver.
    """
    from ..owlqn import minimize_owlqn as _minimize_owlqn

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
    fg = make_sharded_fg(local_fun, local_fun_and_grad, axis_name)

    l1 = jnp.asarray(l1)
    l1_spec = P(axis_name) if l1.ndim else P()

    def solve_local(x0_local, l1_local):
        return _minimize_owlqn(fun_and_grad=fg, x0=x0_local, l1=l1_local,
                               params=params, axis_name=axis_name)

    shmapped = jax.shard_map(solve_local, mesh=mesh,
                             in_specs=(P(axis_name), l1_spec),
                             out_specs=_result_specs(axis_name))
    return shmapped(x0, l1)


def sharding_for(mesh: Mesh, axis_name: str = AXIS) -> NamedSharding:
    """The NamedSharding for global parameter vectors on this mesh — use it
    with ``jax.device_put`` to place huge ``x0`` without a host copy."""
    return NamedSharding(mesh, P(axis_name))
