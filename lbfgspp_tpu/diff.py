"""Implicit differentiation of solves — ``d x*(theta) / d theta``.

The reference is a C++ library with no derivative story beyond the
user-supplied gradient; in JAX a solver can itself be *differentiable*:
for a parametric objective ``f(x, theta)`` the solution
``x*(theta) = argmin_x f(x, theta)`` satisfies the stationarity system
``g(x*, theta) = 0`` (with ``g = grad_x f``), so by the implicit function
theorem

    dx*/dtheta = -[H_xx]^{-1} H_xtheta        (at a strict local minimum)

and a VJP with cotangent ``v`` on ``x*`` costs ONE linear solve
``H_xx u = v`` plus one mixed VJP — no differentiation through the
iteration trace (which is impossible anyway: the line-search
``while_loop`` is not reverse-differentiable, and unrolling 150
iterations would be absurd on TPU).

:func:`implicit_minimize` wraps :func:`~.lbfgs.minimize` /
:func:`~.lbfgsb.minimize` in a ``jax.custom_vjp``:

* forward = the ordinary solve (any line search, any drive);
* backward = matrix-free conjugate gradients on Hessian-vector products
  (``jax.jvp`` of the gradient at ``x*``) — TPU-native: no materialized
  Hessian, no ``linalg.solve`` (unsupported for f64 on TPU), just the
  same fused matvec/reduction machinery as the solver itself;
* the solver's own curvature history preconditions the CG solve: the
  two-loop recursion :func:`~.ops.history.apply_hv` IS an approximation
  of ``H_xx^{-1}``, so the m stored correction pairs give a free
  quasi-Newton preconditioner (``precondition=True``).

Box constraints (``lb``/``ub``) are handled by the active-set reduction:
coordinates at an active bound have ``dx*/dtheta = 0`` (for
non-degenerate multipliers), and the linear solve restricts to the free
block ``P H_xx P + (I - P)``.

Only the ``x`` and ``fx`` fields of the returned :class:`SolveResult`
carry derivatives.  ``fx`` uses the envelope theorem
(``d f(x*, theta)/dtheta = \\partial_theta f`` at stationarity — the
indirect term is kept for inexact solves, it costs nothing extra).
``grad``/``gnorm`` are identically zero to first order at stationarity
(``d g(x*(theta), theta)/dtheta = H (dx*/dtheta) + g_theta = 0``) and the
integer counters are non-differentiable; their cotangents are ignored.

Assumptions: the solve converged to a strict local minimum (``H_xx``
positive definite on the free block) and, for boxes, strict
complementarity.  These are the standard implicit-differentiation
hypotheses; at non-converged points the derivative is approximate.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .params import LBFGSParams, LBFGSBParams
from .types import SolveResult
from .ops import history as hist_ops
from . import lbfgs, lbfgsb

Array = jax.Array


def _value_fn(fun, fun_and_grad):
    if fun is not None:
        return fun
    return lambda x, theta: fun_and_grad(x, theta)[0]


def _grad_fn(fun, fun_and_grad):
    if fun_and_grad is not None:
        return lambda x, theta: fun_and_grad(x, theta)[1]
    return jax.grad(fun, argnums=0)


def implicit_minimize(fun: Optional[Callable] = None,
                      x0: Array = None,
                      theta=None,
                      params=None,
                      *,
                      fun_and_grad=None,
                      lb: Optional[Array] = None,
                      ub: Optional[Array] = None,
                      line_search: Optional[str] = None,
                      precondition: bool = True,
                      cg_tol: float = 1e-8,
                      cg_maxiter: Optional[int] = None) -> SolveResult:
    """Solve ``argmin_x fun(x, theta)`` and make the result differentiable
    with respect to ``theta`` (a pytree of arrays) via the implicit
    function theorem.

    ``fun(x, theta) -> fx`` (or ``fun_and_grad(x, theta) -> (fx, g)``).
    With ``lb``/``ub`` the box-constrained solver runs and the adjoint
    solve restricts to the free (non-active) coordinates.

    Returns a :class:`SolveResult`; ``.x`` and ``.fx`` are differentiable
    (reverse mode), everything else is treated as constant.  ``vmap``
    composes (batched ``theta``/``x0``).

    ``precondition`` uses the final L-BFGS curvature history (the
    two-loop :func:`~.ops.history.apply_hv`) as the CG preconditioner;
    ``cg_tol``/``cg_maxiter`` control the adjoint solve
    (``jax.scipy.sparse.linalg.cg`` defaults apply when ``None``).
    """
    if (fun is None) == (fun_and_grad is None):
        raise ValueError("exactly one of 'fun' / 'fun_and_grad' is required")
    boxed = lb is not None or ub is not None
    if boxed and (lb is None or ub is None):
        raise ValueError("boxes need both lb and ub (use +-inf for "
                         "one-sided bounds)")
    if params is None:
        params = LBFGSBParams() if boxed else LBFGSParams()
    if line_search is None:
        line_search = "morethuente" if boxed else "nocedalwright"

    vfun = _value_fn(fun, fun_and_grad)
    gfun = _grad_fn(fun, fun_and_grad)

    def primal(x0, theta):
        if fun_and_grad is not None:
            fg = lambda x: fun_and_grad(x, theta)
            if boxed:
                return lbfgsb.minimize(fun_and_grad=fg, x0=x0, lb=lb, ub=ub,
                                       params=params,
                                       line_search=line_search)
            return lbfgs.minimize(fun_and_grad=fg, x0=x0, params=params,
                                  line_search=line_search)
        f1 = lambda x: fun(x, theta)
        if boxed:
            return lbfgsb.minimize(f1, x0, lb, ub, params,
                                   line_search=line_search)
        return lbfgs.minimize(f1, x0, params, line_search=line_search)

    @jax.custom_vjp
    def solve(x0, theta):
        return primal(x0, theta)

    def fwd(x0, theta):
        res = primal(x0, theta)
        return res, (res.x, res.grad, res.history, theta)

    def bwd(residuals, ct: SolveResult):
        xs, gs, hist, theta = residuals
        dtype = xs.dtype

        # Free-coordinate projector: strictly-interior coordinates move
        # with theta; active-bound coordinates are pinned (strict
        # complementarity) and their implicit derivative is 0.
        if boxed:
            lbb = jnp.broadcast_to(jnp.asarray(lb, dtype), xs.shape)
            ubb = jnp.broadcast_to(jnp.asarray(ub, dtype), xs.shape)
            free = ((xs > lbb) & (xs < ubb)).astype(dtype)
        else:
            free = jnp.ones_like(xs)

        # Total cotangent reaching x*: the direct ct on x plus fx's
        # indirect term (zero at exact stationarity; kept for inexact
        # solves at the cost of one axpy).
        ct_fx = jnp.asarray(ct.fx, dtype)
        rhs = free * (ct.x + ct_fx * gs)

        def hvp(u):
            return jax.jvp(lambda xx: gfun(xx, theta), (xs,), (u,))[1]

        def amat(u):
            return free * hvp(free * u) + (1.0 - free) * u

        # The box solver's history is a BHistory (base + middle matrix);
        # the two-loop preconditioner needs the base LBFGSHistory.
        base_hist = getattr(hist, "base", hist)
        if precondition:
            def minv(r):
                return free * hist_ops.apply_hv(base_hist, free * r, 1.0) \
                    + (1.0 - free) * r
        else:
            minv = None

        u, _ = jax.scipy.sparse.linalg.cg(amat, rhs, tol=cg_tol,
                                          maxiter=cg_maxiter, M=minv)
        u = free * u

        # dtheta = -(d g / d theta)^T u  +  ct_fx * (d f / d theta)
        _, g_vjp = jax.vjp(lambda th: gfun(xs, th), theta)
        (dtheta,) = g_vjp(-u)
        _, f_vjp = jax.vjp(lambda th: vfun(xs, th), theta)
        (dtheta_f,) = f_vjp(ct_fx)
        dtheta = jax.tree.map(jnp.add, dtheta, dtheta_f)

        # x0 only selects the basin; within it the solution is locally
        # constant in x0.
        return jnp.zeros_like(xs), dtheta

    solve.defvjp(fwd, bwd)
    return solve(jnp.asarray(x0), theta)
