"""Batch-axis convenience API.

The batch axis is plain ``jax.vmap`` of a whole solve (the drivers'
frozen-carry masking makes per-instance termination exact); these wrappers
package the common patterns — a batch of starts against one objective, or
a batch of problem instances via in_axes — with jit applied.

The reference's closest analog is the sequential 1024-start loops in its
examples (example-rosenbrock-bracketing.cpp:44); here the whole sweep is
one device launch.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .params import LBFGSParams, LBFGSBParams
from .types import SolveResult
from . import lbfgs, lbfgsb

Array = jax.Array


def minimize_batched(fun: Optional[Callable] = None,
                     x0s: Array = None,
                     params: LBFGSParams = LBFGSParams(),
                     *,
                     fun_and_grad=None,
                     line_search: str = "nocedalwright",
                     jit: bool = True,
                     mesh=None,
                     batch_axis: str = "batch") -> SolveResult:
    """Solve one objective from a batch of starts ``x0s [B, n]``.

    Returns a :class:`SolveResult` with a leading batch axis on every
    field.  Tip: batch mode runs until the slowest instance terminates, so
    set ``params.max_iterations`` (the reference's 0 = unlimited would let
    one diverged instance stall the whole batch).

    Pass ``mesh`` (a 1-D `jax.sharding.Mesh`) to scale the batch over
    multiple chips data-parallel: instances are independent, so the jitted
    vmap partitions along the batch axis with ZERO collectives — each chip
    runs its shard of instances.  (This is the multi-chip throughput axis;
    the feature axis lives in :mod:`.parallel.sharded`.)
    """
    def solve_one(x0):
        return lbfgs.minimize(fun, x0, params, fun_and_grad=fun_and_grad,
                              line_search=line_search)

    f = jax.vmap(solve_one)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(batch_axis))
        x0s = jax.device_put(jnp.asarray(x0s), sh)
        f = jax.jit(f)
    elif jit:
        f = jax.jit(f)
    return f(x0s)


def minimize_b_batched(fun: Optional[Callable] = None,
                       x0s: Array = None,
                       lb: Array = None,
                       ub: Array = None,
                       params: LBFGSBParams = LBFGSBParams(),
                       *,
                       fun_and_grad=None,
                       line_search: str = "morethuente",
                       jit: bool = True) -> SolveResult:
    """Box-constrained batch solve; ``lb``/``ub`` are shared [n] bounds or
    per-instance [B, n]."""
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    per_instance = lb.ndim == 2

    def solve_one(x0, lbi, ubi):
        return lbfgsb.minimize(fun, x0, lbi, ubi, params,
                               fun_and_grad=fun_and_grad,
                               line_search=line_search)

    in_axes = (0, 0, 0) if per_instance else (0, None, None)
    f = jax.vmap(solve_one, in_axes=in_axes)
    if jit:
        f = jax.jit(f)
    return f(x0s, lb, ub)
