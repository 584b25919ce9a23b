"""Core pytree types and status codes.

The reference library reports failures by throwing C++ exceptions
(e.g. LineSearchBacktracking.h:110-120, LineSearchMoreThuente.h:360-377,
LineSearchNocedalWright.h:227/247/267) and reports success by returning the
iteration count from ``minimize`` (LBFGS.h:79, LBFGSB.h:117).  Exceptions
cannot cross a ``jax.jit`` boundary, so every throw site maps to an entry of
:class:`Status`, carried through the solver ``lax.while_loop`` and surfaced in
:class:`SolveResult.status`.  In batch (vmap) mode each problem instance
carries its own status, so one diverged instance never aborts the batch.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class Status(enum.IntEnum):
    """Solver / line-search termination codes."""

    RUNNING = 0
    # Successful terminations
    CONVERGED_GRAD = 1       # gradient-norm test (LBFGS.h:137, LBFGSB.h:213)
    CONVERGED_DELTA = 2      # past/delta objective test (LBFGS.h:142-149)
    MAX_ITERATIONS = 3       # iteration cap reached (LBFGS.h:151)
    # Line-search failures (each maps to a reference `throw` site)
    LS_INVALID_STEP = 10     # 'step' must be positive / outside [min,max]
    LS_NOT_DESCENT = 11      # direction does not decrease f
    LS_MAX_LINESEARCH = 12   # backtracking/bracketing iteration cap
    LS_STEP_TOO_SMALL = 13   # step fell below param.min_step
    LS_STEP_TOO_LARGE = 14   # step exceeded param.max_step
    LS_BRACKET_INVERTED = 15  # bracketing lower bound passed upper bound
    LS_NUMERICAL = 16        # interpolation failure (NocedalWright zoom)


# Status values that are *successful* terminations of minimize().
SUCCESS_STATUSES = (Status.CONVERGED_GRAD, Status.CONVERGED_DELTA,
                    Status.MAX_ITERATIONS)


class LineSearchResult(NamedTuple):
    """Output of a line search: the accepted trial point.

    Mirrors the in/out reference parameters of the unified line-search call
    (LBFGS.h:127, LBFGSB.h:203): ``step``, ``fx``, ``grad``, ``dg``, ``x``,
    plus a status code and the number of objective evaluations (the reference
    exposes the latter only through user-side call counting,
    examples/example-rosenbrock-comparison.cpp:21).
    """

    step: Array
    fx: Array
    grad: Array
    dg: Array
    x: Array
    status: Array   # int32, Status value
    nfev: Array     # int32, number of f/g evaluations performed


class SolveResult(NamedTuple):
    """Result of ``minimize``.

    The reference returns the iteration count and exposes the final iterate /
    gradient through accessors (LBFGS.h:182-197, LBFGSB.h:271-279); here all
    of it is one pytree.  ``gnorm`` is the Euclidean gradient norm for L-BFGS
    and the infinity norm of the projected gradient for L-BFGS-B, matching the
    respective ``final_grad_norm`` accessors.
    """

    x: Array
    fx: Array
    grad: Array
    gnorm: Array
    niter: Array     # int32, iterations used (reference return value)
    nfev: Array      # int32, total objective evaluations
    status: Array    # int32, Status value
    history: Any     # LBFGSHistory / LBFGSBHistory at the final iterate

    @property
    def numerical_issue(self) -> Array:
        """True where a middle-matrix factorization hit a failed/zero
        pivot during the solve (L-BFGS-B only) — the factorization's
        NUMERICAL_ISSUE status (BKLDLT.h:15-20), which the reference
        computes but silently discards (BFGSMat.h:558).  Latched across
        iterations; a pathological-direction matrix reset clears it.
        Always False for L-BFGS results (no middle matrix exists).
        Batched results return a per-instance boolean array."""
        info = getattr(self.history, "info", None)
        if info is None:
            return jnp.zeros(jnp.shape(self.fx), bool)
        return info > 0


# A value-and-gradient oracle: x -> (fx, grad).
ValueAndGrad = Callable[[Array], tuple]


def make_fun_and_grad(fun: Optional[Callable] = None,
                      fun_and_grad: Optional[ValueAndGrad] = None
                      ) -> ValueAndGrad:
    """Build the objective oracle used by solvers and line searches.

    The reference contract is a functor ``f(x, grad) -> fx`` overwriting
    ``grad`` in place (README.md:19-22).  The functional equivalent is
    ``x -> (fx, grad)``.  Users may pass either a plain ``fun`` (gradient via
    ``jax.value_and_grad`` — strictly more capable than the reference's
    hand-written-gradient requirement) or an explicit ``fun_and_grad``.
    """
    if fun_and_grad is not None:
        return fun_and_grad
    if fun is None:
        raise ValueError("either 'fun' or 'fun_and_grad' must be provided")
    return jax.value_and_grad(fun)


def tree_select(pred: Array, on_true, on_false):
    """Elementwise ``where`` over matching pytrees with a scalar predicate.

    Used to freeze the carry of converged instances inside a batched
    ``lax.while_loop`` body so that ``vmap`` of a whole solve is exact:
    finished instances pass through unchanged while active ones update.
    """
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def freeze_when(pred: Array, state, update_fn):
    """``update_fn(state)`` unless ``pred`` — a ``lax.cond``.

    Single-instance solves take a real branch (no full-carry select copy —
    material at large n); under ``vmap`` the cond lowers to running both
    branches with an elementwise select, which is exactly the frozen-carry
    masking that keeps finished batch instances untouched."""
    from jax import lax
    return lax.cond(pred, lambda s: s, update_fn, state)
