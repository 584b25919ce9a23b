"""Pytree-parameter front end: optimize arbitrarily structured parameters.

The reference's user contract is a flat ``Eigen::VectorXd``
(/root/reference/README.md:19-22; LBFGS.h:79, LBFGSB.h:117) — natural for
classical numerical problems, but JAX users hold model parameters as nested
containers (dicts of layers, NamedTuples, flax/haiku param trees).  This
module lifts both solver families to objectives over ANY pytree of arrays:

* :func:`minimize_pytree`  — L-BFGS over ``fun(params_tree) -> scalar``;
* :func:`minimize_b_pytree` — L-BFGS-B with bounds given per-leaf (a pytree
  matching ``x0``'s structure) or as scalars broadcast to every parameter.

Internally the tree is raveled once (``jax.flatten_util.ravel_pytree``) and
the flat solver runs unchanged — so every capability of the flat API
(line-search choice, ``history_dtype``, ``vmap`` over a batch of trees,
checkpointable state, implicit differentiation through the flat result)
composes with this front end.  The returned :class:`~.types.SolveResult`
carries ``x`` and ``grad`` unraveled back to the input structure.

Mixed-dtype trees follow ``ravel_pytree`` semantics: the flat vector is the
leaves' common promoted dtype and ``unravel`` casts each leaf back, so the
solver arithmetic runs in the promoted dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from . import lbfgs, lbfgsb
from .params import LBFGSParams, LBFGSBParams
from .types import SolveResult


def _flat_objective(fun, fun_and_grad, unravel):
    """Lift a pytree objective to the flat vector the solvers consume.

    With an explicit ``fun_and_grad`` the gradient tree is raveled with the
    same leaf order as ``x0`` (identical structure -> identical flatten
    order), matching the reference's in-place-gradient functor contract
    (README.md:19-22) on trees.
    """
    if fun_and_grad is not None:
        def fg_flat(z):
            fx, g_tree = fun_and_grad(unravel(z))
            return fx, ravel_pytree(g_tree)[0]
        return None, fg_flat
    if fun is None:
        raise ValueError("either 'fun' or 'fun_and_grad' must be provided")
    return (lambda z: fun(unravel(z))), None


def _unravel_result(res: SolveResult, unravel) -> SolveResult:
    return res._replace(x=unravel(res.x), grad=unravel(res.grad))


def minimize_pytree(fun: Optional[Callable] = None,
                    x0: Any = None,
                    params: LBFGSParams = LBFGSParams(),
                    *,
                    fun_and_grad=None,
                    line_search="nocedalwright",
                    history_dtype=None) -> SolveResult:
    """Minimize a scalar function of a parameter pytree with L-BFGS.

    Same semantics as :func:`lbfgspp_tpu.minimize` (LBFGS.h:79-173) with
    ``x0`` any pytree of arrays; ``fun`` receives the structured tree.  The
    result's ``x``/``grad`` have ``x0``'s structure; ``gnorm``/``fx``/
    ``niter``/``status`` are the flat solver's, and ``history`` is the flat
    curvature history (usable by ``final_approx_*hessian`` in the raveled
    basis).
    """
    flat0, unravel = ravel_pytree(x0)
    f_flat, fg_flat = _flat_objective(fun, fun_and_grad, unravel)
    res = lbfgs.minimize(f_flat, flat0, params, fun_and_grad=fg_flat,
                         line_search=line_search,
                         history_dtype=history_dtype)
    return _unravel_result(res, unravel)


def _ravel_bound(bound, x0, flat0, side: str):
    """Ravel a bound given as a pytree (matching ``x0``) or a scalar."""
    if bound is None:
        fill = -jnp.inf if side == "lb" else jnp.inf
        return jnp.full(flat0.shape, fill, flat0.dtype)
    treedef = jax.tree.structure(x0)
    if jax.tree.structure(bound) == treedef:
        leaves = jax.tree.leaves(x0)
        bleaves = jax.tree.leaves(bound)
        flat = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(b, flat0.dtype),
                              jnp.shape(l)).ravel()
             for b, l in zip(bleaves, leaves)]) if leaves else flat0
        return flat
    # Scalar (or 0-d array) broadcast to every parameter.
    b = jnp.asarray(bound, flat0.dtype)
    if b.ndim != 0:
        raise ValueError(
            f"'{side}' must be a scalar or a pytree matching x0's structure; "
            f"got structure {jax.tree.structure(bound)} vs {treedef}")
    return jnp.full(flat0.shape, b, flat0.dtype)


def minimize_b_pytree(fun: Optional[Callable] = None,
                      x0: Any = None,
                      lb: Any = None,
                      ub: Any = None,
                      params: LBFGSBParams = LBFGSBParams(),
                      *,
                      fun_and_grad=None,
                      line_search="morethuente",
                      gcp: str = "scan") -> SolveResult:
    """Box-constrained minimization over a parameter pytree (L-BFGS-B).

    Same semantics as :func:`lbfgspp_tpu.minimize_b` (LBFGSB.h:117-262).
    ``lb``/``ub`` may each be a scalar (one bound for every parameter — e.g.
    non-negativity ``lb=0.0``), a pytree matching ``x0``'s structure whose
    leaves are scalars or arrays broadcastable to the corresponding
    parameter leaf (per-leaf boxes), or ``None`` (unbounded side).
    ``lb == ub`` on a leaf pins those parameters (Cauchy.h:113-114) — the
    pytree equivalent of freezing a layer.
    """
    flat0, unravel = ravel_pytree(x0)
    f_flat, fg_flat = _flat_objective(fun, fun_and_grad, unravel)
    lbf = _ravel_bound(lb, x0, flat0, "lb")
    ubf = _ravel_bound(ub, x0, flat0, "ub")
    res = lbfgsb.minimize(f_flat, flat0, lbf, ubf, params,
                          fun_and_grad=fg_flat, line_search=line_search,
                          gcp=gcp)
    return _unravel_result(res, unravel)
