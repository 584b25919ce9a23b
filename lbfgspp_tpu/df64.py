"""Full double-float (df64) solves: f64-grade accuracy on f32 hardware.

The reference library assumes ``Scalar = double`` throughout (its README
anchor quotes f(x) = 1.9e-19, README.md:88-94); TPUs have no native f64.
:func:`minimize_df64` runs the ENTIRE solve in *pair space*: the solver
operates on ``2n`` ordinary f32 coordinates ``[hi; lo]`` while the
objective and gradient are evaluated at the exact sum ``hi + lo`` in
double-float arithmetic (:mod:`.utils.doublefloat`, ~2^-48 relative
precision for an f32 base).  This removes both f32 walls — the gradient
rounding floor and the ulp(x) step wall — giving reference-grade
(double-precision-criterion) solutions end to end on f32 hardware.

This is the from-scratch complement to the cheaper two-phase recipe
(f32 main solve + short df64 polish, :func:`..batch.polish_solve`): use
``minimize_df64`` when every iterate must carry df64 accuracy (e.g.
ill-conditioned problems where f32 curvature pairs poison the history),
the two-phase recipe when only the endgame needs it (the batched bench
headline).  Unconstrained only: a box ``lb <= hi + lo <= ub`` is not a
coordinate box on ``[hi; lo]``, so L-BFGS-B does not pair-lift.

Semantics note: convergence is tested on the PAIR-space gradient, whose
Euclidean norm is ``sqrt(2) * ||df64 grad||`` (the true gradient is
duplicated on both halves); ``epsilon`` and ``epsilon_rel`` are
pre-multiplied by ``sqrt(2)`` so the test matches the reference's
``||g|| <= max(eps, eps_rel ||x||)`` (LBFGS.h:137) on the underlying
gradient.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import lbfgs
from .ops import history as hist_ops
from .params import LBFGSParams
from .types import SolveResult
from .utils import doublefloat as dfl

Array = jax.Array


def minimize_df64(fun: Optional[Callable] = None,
                  x0: Array = None,
                  params: LBFGSParams = LBFGSParams(),
                  *,
                  fun_and_grad=None,
                  line_search: str = "morethuente") -> SolveResult:
    """Minimize ``fun`` from ``x0`` with every iterate in df64 pair space.

    Mirrors ``LBFGSSolver<double>::minimize`` (LBFGS.h:79-173) semantics
    on f32 hardware.  ``x0`` may be any float dtype; the solve runs in
    pairs of ``x0.dtype``.  vmap/jit compose as with :func:`..lbfgs
    .minimize`.  The returned ``SolveResult`` is in the original [n]
    space; ``history`` is an empty [m, n] history (the curvature pairs
    live in pair space — Hessian accessors on it give ``theta * I``).
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    fg2 = dfl.df64_pair_fun_and_grad(fun, fun_and_grad=fun_and_grad)
    # Pair-space gradient norm is sqrt(2)*||g|| (the true df64 gradient is
    # duplicated on both halves), and ||[hi; lo]|| ~ ||x||: to keep the
    # reference test ||g|| <= max(eps, eps_rel ||x||) (LBFGS.h:137), both
    # thresholds must be INFLATED by sqrt(2).
    pparams = dataclasses.replace(
        params, epsilon=params.epsilon * math.sqrt(2.0),
        epsilon_rel=params.epsilon_rel * math.sqrt(2.0))
    s = lbfgs.solver(fun_and_grad=fg2, params=pparams,
                     line_search=line_search)
    x2 = jnp.concatenate([x0, jnp.zeros_like(x0)])
    res2 = s.finalize(s.run(s.init(x2)))
    x = dfl.pair_to_float(res2.x)
    grad = res2.grad[:n]
    return SolveResult(x=x, fx=res2.fx, grad=grad,
                       gnorm=jnp.linalg.norm(grad),
                       niter=res2.niter, nfev=res2.nfev,
                       status=res2.status,
                       history=hist_ops.init_history(n, params.m, x.dtype))
