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
from .parallel import collectives as coll
from . import lbfgs, lbfgsb

Array = jax.Array


def _add_cotangents(a, b):
    """Leafwise cotangent sum that passes ``float0`` leaves through.

    ``jax.vjp`` returns ``float0`` cotangents for non-float leaves of
    ``theta`` (integer labels, boolean masks riding along in the pytree);
    ``jnp.add`` rejects those, and both addends are float0 on exactly the
    same leaves (they are cotangents of the same pytree)."""
    def add(u, v):
        if getattr(u, "dtype", None) == jax.dtypes.float0:
            return u
        return jnp.add(u, v)
    return jax.tree.map(add, a, b)


def _resolve_cg_tol(cg_tol, dtype):
    """Dtype-aware default CG tolerance: 1e-8 needs ~f64; the f32
    attainable relative residual floor is ~eps = 1.2e-7, so an f32 solve
    with tol below it would spin to maxiter with no accuracy gain."""
    if cg_tol is not None:
        return cg_tol
    return 1e-8 if jnp.finfo(dtype).bits >= 64 else 3e-6


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
                      cg_tol: Optional[float] = None,
                      cg_maxiter: int = 200,
                      active_tol: float = 0.0) -> SolveResult:
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
    ``cg_tol``/``cg_maxiter`` control the adjoint solve (the tolerance
    default is dtype-aware: 1e-8 in f64, 3e-6 in f32 — below the f32
    residual floor CG cannot converge; the finite ``maxiter`` default
    bounds the adjoint cost on ill-conditioned problems — raise it when
    the Hessian's condition number demands more than ~200 iterations).

    ``active_tol`` widens the active-set classification for boxes: a
    coordinate within ``active_tol`` of a bound is treated as active
    (derivative 0).  The default 0.0 matches the solver's exact
    bound-snapping (the GCP and ``force_bounds`` land active coordinates
    bitwise on the bound); set a small positive value if a custom
    termination leaves active coordinates epsilon-inside the bound,
    where misclassifying them as free gives an O(1)-wrong derivative.
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
            tol = jnp.asarray(active_tol, dtype)
            free = ((xs > lbb + tol) & (xs < ubb - tol)).astype(dtype)
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

        u, _ = jax.scipy.sparse.linalg.cg(amat, rhs,
                                          tol=_resolve_cg_tol(cg_tol, dtype),
                                          maxiter=cg_maxiter, M=minv)
        u = free * u

        # dtheta = -(d g / d theta)^T u  +  ct_fx * (d f / d theta)
        _, g_vjp = jax.vjp(lambda th: gfun(xs, th), theta)
        (dtheta,) = g_vjp(-u)
        _, f_vjp = jax.vjp(lambda th: vfun(xs, th), theta)
        (dtheta_f,) = f_vjp(ct_fx)
        dtheta = _add_cotangents(dtheta, dtheta_f)

        # x0 only selects the basin; within it the solution is locally
        # constant in x0.
        return jnp.zeros_like(xs), dtheta

    solve.defvjp(fwd, bwd)
    return solve(jnp.asarray(x0), theta)


def _pcg(amat, b, minv, tol, maxiter, axis_name):
    """Preconditioned conjugate gradients with COLLECTIVE inner products
    (:func:`..parallel.collectives.pdot`) — runs on a feature shard under
    ``shard_map``; every vector op is local, every reduction one psum."""
    from jax import lax

    bnorm2 = coll.psqnorm(b, axis_name)
    z0 = minv(b) if minv is not None else b
    rz0, rr0 = coll.pdot2(b, z0, b, b, axis_name)

    # Carry: (i, x, r, p, rz, rr) — r'r is computed in the body fused
    # with r'z (one length-2 psum) so the cond reads a scalar instead of
    # issuing a third collective per iteration; z is recomputed from r in
    # the body, not carried.
    def cond(c):
        i, x, r, p, rz, rr = c
        return (i < maxiter) & (rr > tol * tol * bnorm2)

    def body(c):
        i, x, r, p, rz, rr = c
        ap = amat(p)
        alpha = rz / coll.pdot(p, ap, axis_name)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv(r) if minv is not None else r
        rz_new, rr_new = coll.pdot2(r, z, r, r, axis_name)
        p = z + (rz_new / rz) * p
        return i + 1, x, r, p, rz_new, rr_new

    init = (jnp.zeros((), jnp.int32), jnp.zeros_like(b), b, z0, rz0, rr0)
    return lax.while_loop(cond, body, init)[1]


def implicit_minimize_sharded(local_fun: Optional[Callable] = None,
                              x0: Array = None,
                              theta=None,
                              params=None,
                              *,
                              local_fun_and_grad=None,
                              lb: Optional[Array] = None,
                              ub: Optional[Array] = None,
                              mesh=None,
                              axis_name: str = "feat",
                              line_search: Optional[str] = None,
                              precondition: bool = True,
                              cg_tol: Optional[float] = None,
                              cg_maxiter: int = 200,
                              active_tol: float = 0.0) -> SolveResult:
    """Implicitly-differentiable solve with the parameter vector sharded
    over a device mesh — :func:`implicit_minimize` for the huge-n regime.

    ``local_fun(x_local, theta) -> fx_partial`` follows the sharded
    partial-objective contract (:mod:`..parallel.sharded`): it receives
    this device's shard of ``x`` plus the replicated ``theta`` pytree and
    returns the shard's additive contribution to the global objective.
    The forward pass is :func:`~..parallel.sharded.minimize_sharded` (or
    the box variant when ``lb``/``ub`` are given, global [n] vectors
    sharded like ``x0``); the backward pass runs a COLLECTIVE
    preconditioned-CG adjoint under the same ``shard_map`` — local
    Hessian-vector products via ``jax.jvp`` of the local gradient (psums
    inside the objective transpose correctly), one psum per CG dot, and
    the solve's own sharded curvature history as the preconditioner.

    ``theta`` enters the mapped adjoint as a replicated argument, so
    shard_map's varying-aware AD accounts for cross-device accumulation
    itself (the transpose of the implicit broadcast is a psum) — the
    returned ``d theta`` is exact whether theta feeds per-feature local
    terms or replicated post-collective ones.

    Only ``.x`` and ``.fx`` of the result carry derivatives (see
    :func:`implicit_minimize`).
    """
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from .parallel import sharded as shd

    if (local_fun is None) == (local_fun_and_grad is None):
        raise ValueError(
            "exactly one of 'local_fun' / 'local_fun_and_grad' is required")
    boxed = lb is not None or ub is not None
    if boxed and (lb is None or ub is None):
        raise ValueError("boxes need both lb and ub (use +-inf for "
                         "one-sided bounds)")
    if params is None:
        params = LBFGSBParams() if boxed else LBFGSParams()
    if line_search is None:
        line_search = "morethuente" if boxed else "nocedalwright"
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis_name,))

    if local_fun is not None:
        def gfun_l(x_l, th):
            return jax.grad(local_fun, argnums=0)(x_l, th)

        def vfun_l(x_l, th):          # shard-partial objective value
            return local_fun(x_l, th)
    else:
        def gfun_l(x_l, th):
            return local_fun_and_grad(x_l, th)[1]

        def vfun_l(x_l, th):
            return local_fun_and_grad(x_l, th)[0]

    def primal(x0, theta):
        if local_fun is not None:
            lf = lambda xl: local_fun(xl, theta)
            lfg = None
        else:
            lf = None
            lfg = lambda xl: local_fun_and_grad(xl, theta)
        if boxed:
            return shd.minimize_b_sharded(
                local_fun=lf, x0=x0, lb=lb, ub=ub, params=params,
                mesh=mesh, axis_name=axis_name, local_fun_and_grad=lfg,
                line_search=line_search)
        return shd.minimize_sharded(
            local_fun=lf, x0=x0, params=params, mesh=mesh,
            axis_name=axis_name, local_fun_and_grad=lfg,
            line_search=line_search)

    @jax.custom_vjp
    def solve(x0, theta):
        return primal(x0, theta)

    def fwd(x0, theta):
        res = primal(x0, theta)
        return res, (res.x, res.grad, res.history, theta)

    def bwd(residuals, ct: SolveResult):
        import numpy as onp

        xs, gs, hist, theta = residuals
        dtype = xs.dtype
        ct_fx = jnp.asarray(ct.fx, dtype)
        theta_specs = jax.tree.map(lambda _: P(), theta)
        hist_specs = (shd._result_specs_b(axis_name).history if boxed
                      else shd._result_specs(axis_name).history)

        # Differentiate only the inexact (float) leaves of theta: jax.vjp
        # over integer/bool leaves is unimplemented for shard_map tracers,
        # and their cotangents are float0 anyway — assembled outside the
        # mapped region.
        th_leaves, th_treedef = jax.tree.flatten(theta)
        diff_idx = [i for i, l in enumerate(th_leaves)
                    if jnp.issubdtype(jnp.result_type(l), jnp.inexact)]

        def adjoint_local(xs_l, gs_l, hist_l, ctx_l, ctfx, th,
                          lb_l, ub_l):
            if boxed:
                tol_a = jnp.asarray(active_tol, dtype)
                free = ((xs_l > lb_l + tol_a) &
                        (xs_l < ub_l - tol_a)).astype(dtype)
            else:
                free = jnp.ones_like(xs_l)
            rhs = free * (ctx_l + ctfx * gs_l)

            def hvp(u_l):
                return jax.jvp(lambda xl: gfun_l(xl, th), (xs_l,),
                               (u_l,))[1]

            def amat(u_l):
                return free * hvp(free * u_l) + (1.0 - free) * u_l

            base_hist = getattr(hist_l, "base", hist_l)
            if precondition:
                def minv(r_l):
                    return free * hist_ops.apply_hv(
                        base_hist, free * r_l, 1.0, axis_name) \
                        + (1.0 - free) * r_l
            else:
                minv = None

            u_l = free * _pcg(amat, rhs, minv,
                              _resolve_cg_tol(cg_tol, dtype), cg_maxiter,
                              axis_name)

            leaves_l = jax.tree.leaves(th)

            def with_diff(diff_list):
                new_leaves = list(leaves_l)
                for i, v in zip(diff_idx, diff_list):
                    new_leaves[i] = v
                return jax.tree.unflatten(th_treedef, new_leaves)

            td = [leaves_l[i] for i in diff_idx]
            _, g_vjp = jax.vjp(lambda t: gfun_l(xs_l, with_diff(t)), td)
            (dth,) = g_vjp(-u_l)
            _, f_vjp = jax.vjp(lambda t: vfun_l(xs_l, with_diff(t)), td)
            # local_fun returns a device-varying partial value (cotangent
            # must be marked varying for shard_map's type system);
            # local_fun_and_grad returns the replicated global fx
            # (cotangent stays invariant)
            ct_val = (coll.pvary(ctfx, axis_name) if local_fun is not None
                      else ctfx)
            (dth_f,) = f_vjp(ct_val)
            # NOTE no manual psum here: ``th`` enters the mapped function
            # as a replicated (device-invariant) argument, so shard_map's
            # varying-aware AD already inserts the cross-device psum when
            # transposing the implicit pvary — the returned cotangent is
            # the globally summed dtheta on every device.
            dth = _add_cotangents(dth, dth_f)
            return jnp.zeros_like(xs_l), dth

        P_ = P(axis_name)
        bound_specs = (P_, P_) if boxed else (P(), P())
        lb_in = jnp.asarray(lb, dtype) if boxed else jnp.zeros(())
        ub_in = jnp.asarray(ub, dtype) if boxed else jnp.zeros(())
        diff_specs = [P() for _ in diff_idx]
        shmapped = jax.shard_map(
            adjoint_local, mesh=mesh,
            in_specs=(P_, P_, hist_specs, P_, P(), theta_specs)
            + bound_specs,
            out_specs=(P_, diff_specs))
        dx0, dth_diff = shmapped(xs, gs, hist, ct.x, ct_fx, theta,
                                 lb_in, ub_in)
        # Reassemble the full theta cotangent: float0 zeros on the
        # non-differentiable leaves (what custom_vjp expects there).
        dleaves = [onp.zeros(onp.shape(l), jax.dtypes.float0)
                   for l in th_leaves]
        for i, v in zip(diff_idx, dth_diff):
            dleaves[i] = v
        dtheta = jax.tree.unflatten(th_treedef, dleaves)
        return dx0, dtheta

    solve.defvjp(fwd, bwd)
    return solve(x0, theta)
