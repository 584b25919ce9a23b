"""Drop-in ``scipy.optimize.minimize``-style front end.

Users migrating from the reference library often sit behind a
``scipy.optimize`` call site; this module adapts that contract onto the
JAX solvers so switching frameworks is a one-line import change:

    from lbfgspp_tpu.scipy_compat import minimize
    out = minimize(f, x0, jac=True, bounds=[(0, None)] * n,
                   options={"maxiter": 200, "gtol": 1e-6})

Semantics map (scipy name -> this framework / reference):

==============  =====================================================
``maxcor``      history size ``m`` (Param.h:86)
``gtol``        ``epsilon``: gradient-norm tolerance (Param.h:95;
                projected-gradient inf-norm in the box case,
                LBFGSB.h:62-65)
``maxiter``     ``max_iterations`` (Param.h:117)
``maxls``       ``max_linesearch`` (Param.h:133)
``ftol``        objective-decrease tolerance ``delta`` with
                ``past=1`` (Param.h:104-115) — the reference's analog
                of scipy's relative-decrease test
``eps_rel``     extension: ``epsilon_rel`` (Param.h:99).  Defaults to 0
                here (scipy has no relative-gradient test, so the
                solver's 1e-5 default would weaken a tight ``gtol``)
==============  =====================================================

``disp``/``iprint``/``eps``/``finite_diff_rel_step``/``maxfun`` are
accepted and ignored (no console output to control; gradients are exact
autodiff; work is bounded by ``maxiter``/``maxls``).

The solve itself is the jittable JAX program — ``fun`` must therefore be
a JAX-traceable pure function (NumPy-only objectives can be wrapped with
``jax.pure_callback`` by the caller).  Unlike scipy, the returned ``x``
is a ``jax.Array``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .params import LBFGSParams, LBFGSBParams
from .types import Status
from . import lbfgs as _lbfgs
from . import lbfgsb as _lbfgsb

__all__ = ["minimize", "fmin_l_bfgs_b", "OptimizeResult"]


class OptimizeResult(dict):
    """Attribute-accessible result dict mirroring
    ``scipy.optimize.OptimizeResult``."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    __setattr__ = dict.__setitem__


_MESSAGES = {
    int(Status.RUNNING): "maximum number of iterations reached",
    int(Status.CONVERGED_GRAD): "gradient tolerance satisfied",
    int(Status.CONVERGED_DELTA): "objective decrease below delta",
    int(Status.MAX_ITERATIONS): "maximum number of iterations reached",
}


def _normalize_bounds(bounds, n):
    """Accept a scipy ``Bounds`` object or a sequence of (lo, hi) pairs
    (``None`` meaning unbounded, as scipy does)."""
    if hasattr(bounds, "lb") and hasattr(bounds, "ub"):
        lb = np.broadcast_to(np.asarray(bounds.lb, np.float64), (n,))
        ub = np.broadcast_to(np.asarray(bounds.ub, np.float64), (n,))
        return np.array(lb), np.array(ub)
    bounds = list(bounds)
    if len(bounds) != n:
        # scipy raises for a length mismatch rather than padding.
        raise ValueError(f"length of x0 != length of bounds "
                         f"({n} != {len(bounds)})")
    lb = np.empty(n)
    ub = np.empty(n)
    for i, pair in enumerate(bounds):
        lo, hi = pair
        lb[i] = -np.inf if lo is None else lo
        ub[i] = np.inf if hi is None else hi
    return lb, ub


def minimize(fun: Callable,
             x0,
             args: tuple = (),
             method: Optional[str] = None,
             jac=None,
             bounds: Optional[Sequence] = None,
             tol: Optional[float] = None,
             options: Optional[dict] = None) -> OptimizeResult:
    """``scipy.optimize.minimize``-compatible entry point.

    ``method`` may be ``None`` (auto: L-BFGS-B when ``bounds`` given,
    else L-BFGS), ``"L-BFGS"`` or ``"L-BFGS-B"``.  ``jac=True`` means
    ``fun`` returns ``(fx, grad)``; a callable ``jac`` is evaluated
    alongside ``fun``; ``jac=None`` uses JAX autodiff.
    """
    options = dict(options or {})
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]

    if method is None:
        method = "L-BFGS-B" if bounds is not None else "L-BFGS"
    method = method.upper()
    if method not in ("L-BFGS", "L-BFGS-B", "LBFGS", "LBFGSB"):
        raise ValueError(f"unsupported method {method!r}")
    boxed = method in ("L-BFGS-B", "LBFGSB")
    if bounds is not None and not boxed:
        # scipy errors rather than silently swapping solvers when the
        # requested method cannot honor bounds; mirror that.
        raise ValueError(f"method {method!r} cannot handle bounds; "
                         "use method='L-BFGS-B' (or method=None)")

    kw = {}
    if "maxcor" in options:
        kw["m"] = int(options.pop("maxcor"))
    if tol is not None and "gtol" not in options:
        options["gtol"] = tol
    if "gtol" in options:
        kw["epsilon"] = float(options.pop("gtol"))
    # scipy has no relative-gradient convergence test, so the solver
    # default epsilon_rel=1e-5 (Param.h:99) would silently override a
    # tight gtol for large-norm solutions; disable it unless the caller
    # opts back in with the extension option.
    kw["epsilon_rel"] = float(options.pop("eps_rel", 0.0))
    if "maxiter" in options:
        kw["max_iterations"] = int(options.pop("maxiter"))
    if "maxls" in options:
        kw["max_linesearch"] = int(options.pop("maxls"))
    if "ftol" in options:
        kw["delta"] = float(options.pop("ftol"))
        kw["past"] = int(options.pop("past", 1))
    elif "past" in options:
        kw["past"] = int(options.pop("past"))
    # Standard scipy L-BFGS-B options with no analog here are tolerated:
    # disp/iprint control scipy's console output (none here), eps /
    # finite_diff_rel_step tune finite differences (gradients are exact
    # via autodiff), maxfun caps f-evals (this solver bounds work by
    # maxiter * maxls instead).
    for ignored in ("disp", "iprint", "eps", "finite_diff_rel_step",
                    "maxfun"):
        options.pop(ignored, None)
    if options:
        raise ValueError(f"unknown options: {sorted(options)}")

    if jac is True:
        f_and_g = (lambda x: fun(x, *args)) if args else fun
        obj = dict(fun_and_grad=f_and_g)
    elif callable(jac):
        obj = dict(fun_and_grad=lambda x: (fun(x, *args), jac(x, *args)))
    else:
        obj = dict(fun=(lambda x: fun(x, *args)) if args else fun)

    if boxed:
        if bounds is None:
            lb = np.full(n, -np.inf)
            ub = np.full(n, np.inf)
        else:
            lb, ub = _normalize_bounds(bounds, n)
        params = LBFGSBParams(**kw)
        res = _lbfgsb.minimize(x0=x0, lb=jnp.asarray(lb, x0.dtype),
                               ub=jnp.asarray(ub, x0.dtype),
                               params=params, **obj)
    else:
        params = LBFGSParams(**kw)
        res = _lbfgs.minimize(x0=x0, params=params, **obj)

    status = int(res.status)
    return OptimizeResult(
        x=res.x, fun=float(res.fx), jac=res.grad,
        nit=int(res.niter), nfev=int(res.nfev),
        status=status,
        # scipy counts hitting maxiter as failure (unlike the reference,
        # which returns the iterate without complaint)
        success=status in (int(Status.CONVERGED_GRAD),
                           int(Status.CONVERGED_DELTA)),
        message=_MESSAGES.get(status, Status(status).name.lower()),
        solver_result=res,
    )


def _task_warnflag(status: int):
    """Map a solver ``Status`` onto scipy's ``(task, warnflag)`` pair.

    scipy's L-BFGS-B reports line-search breakdown as ``warnflag=2`` /
    ``ABNORMAL_TERMINATION_IN_LNSRCH`` and an exhausted iteration budget
    as ``warnflag=1``; mirror that so callers branching on ``warnflag``
    get the same diagnosis."""
    if status == int(Status.CONVERGED_GRAD):
        return "CONVERGENCE: NORM OF PROJECTED GRADIENT <= PGTOL", 0
    if status == int(Status.CONVERGED_DELTA):
        return "CONVERGENCE: REL_REDUCTION_OF_F <= FACTR*EPSMCH", 0
    if status >= int(Status.LS_INVALID_STEP):
        return "ABNORMAL_TERMINATION_IN_LNSRCH", 2
    return "STOP: TOTAL NO. of ITERATIONS REACHED LIMIT", 1


def fmin_l_bfgs_b(func: Callable,
                  x0,
                  fprime: Optional[Callable] = None,
                  args: tuple = (),
                  approx_grad: bool = False,
                  bounds: Optional[Sequence] = None,
                  m: int = 10,
                  factr: float = 1e7,
                  pgtol: float = 1e-5,
                  epsilon: float = 1e-8,
                  iprint: int = -1,
                  maxfun: int = 15000,
                  maxiter: int = 15000,
                  disp=None,
                  callback: Optional[Callable] = None,
                  maxls: int = 20):
    """``scipy.optimize.fmin_l_bfgs_b``-compatible functional front end.

    Returns the scipy triple ``(x, f, info)`` with ``info`` carrying
    ``grad / task / funcalls / nit / warnflag``.  Parameter map:

    - ``factr``: scipy's relative objective-decrease tolerance is
      ``factr * machine_eps``; mapped onto the reference's ``past=1,
      delta`` test (Param.h:104-115).
    - ``pgtol`` -> ``epsilon``: both are the projected-gradient inf-norm
      tolerance (LBFGSB.h:62-65).
    - ``m``/``maxiter``/``maxls`` -> ``m``/``max_iterations``/
      ``max_linesearch``.
    - ``fprime=None`` with ``approx_grad`` false means ``func`` returns
      ``(fx, grad)`` (scipy's convention); ``approx_grad`` true uses JAX
      autodiff (exact, in place of scipy's finite differences — the
      ``epsilon`` step size is accepted and unused).
    - ``callback(xk)`` is honored per outer iteration by driving the
      solver through its ``init/step`` surface instead of one fused
      ``run`` — the per-iteration states are fetched to host, so prefer
      ``callback=None`` for peak throughput.
    - ``iprint``/``disp`` are accepted and ignored (no console output);
      ``maxfun`` is accepted but work is bounded by ``maxiter * maxls``.
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]
    if bounds is None:
        lb = np.full(n, -np.inf)
        ub = np.full(n, np.inf)
    else:
        lb, ub = _normalize_bounds(bounds, n)

    if approx_grad:
        obj = dict(fun=(lambda x: func(x, *args)) if args else func)
    elif fprime is not None:
        obj = dict(fun_and_grad=lambda x: (func(x, *args),
                                           fprime(x, *args)))
    else:
        # scipy: func returns (fx, grad) when fprime is absent and
        # approx_grad is false.
        f_and_g = (lambda x: func(x, *args)) if args else func
        obj = dict(fun_and_grad=f_and_g)

    params = LBFGSBParams(
        m=m,
        epsilon=float(pgtol),
        # scipy's convergence test is absolute (pgtol); no relative test.
        epsilon_rel=0.0,
        past=1,
        delta=float(factr) * float(np.finfo(np.float64).eps),
        max_iterations=int(maxiter),
        max_linesearch=int(maxls),
    )
    lbj = jnp.asarray(lb, x0.dtype)
    ubj = jnp.asarray(ub, x0.dtype)

    if callback is None:
        res = _lbfgsb.minimize(x0=x0, lb=lbj, ub=ubj, params=params, **obj)
    else:
        import jax

        s = _lbfgsb.solver(lb=lbj, ub=ubj, params=params, **obj)
        step = jax.jit(s.step)
        c = s.init(x0)
        while not bool(c.done):
            c = step(c)
            callback(np.asarray(c.x))
        res = s.finalize(c)

    task, warnflag = _task_warnflag(int(res.status))
    info = {
        "grad": res.grad,
        "task": task,
        "funcalls": int(res.nfev),
        "nit": int(res.niter),
        "warnflag": warnflag,
    }
    return res.x, float(res.fx), info


