"""Per-iteration observability.

The reference's tracing story is dozens of commented-out ``std::cout`` lines
at the solver's state transitions (LBFGS.h:96-97, :118, :132-134;
LBFGSB.h:142-143, :156-160, :208-210 — see SURVEY.md §5).  The jittable
equivalents:

* :func:`run_traced` drives any ``init/step/finalize`` solver through a
  fixed-length ``lax.scan`` and returns the full per-iteration metric
  history as arrays — the reference's trace points, but as data (usable
  under ``jit``/``vmap``, plottable, assertable in tests);
* :func:`debug_print_state` is a ``jax.debug.print`` hook for the same
  quantities when a live console trace is wanted (CPU/interpret mode —
  debug callbacks are unsupported on the remote-TPU backend).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class TraceRecord(NamedTuple):
    """Per-iteration history from a traced run ([T]-shaped arrays).

    ``valid[t]`` marks entries produced while the solve was still active;
    entries past termination repeat the final state (the scan is fixed
    length).  ``gnorm`` is the Euclidean gradient norm for L-BFGS and the
    projected-gradient infinity norm for L-BFGS-B, matching the
    ``final_grad_norm`` accessors (LBFGS.h:187, LBFGSB.h:279).
    """

    k: Array
    fx: Array
    gnorm: Array
    nfev: Array
    status: Array
    valid: Array


def run_traced(solver, x0: Array, num_iterations: int):
    """Run ``solver`` (an init/step/finalize triple) for up to
    ``num_iterations`` outer iterations, recording metrics each step.

    Returns ``(SolveResult, TraceRecord)``.  Fully jittable and vmappable;
    the scan length is static, finished instances pass through frozen.
    """
    state0 = solver.init(x0)

    def scan_step(state, _):
        was_done = state.done
        state = solver.step(state)
        gnorm = state.projgnorm if hasattr(state, "projgnorm") \
            else state.gnorm
        rec = (state.k, state.fx, gnorm, state.nfev, state.status,
               ~was_done)
        return state, rec

    state, (k, fx, gnorm, nfev, status, valid) = lax.scan(
        scan_step, state0, None, length=num_iterations)
    return solver.finalize(state), TraceRecord(
        k=k, fx=fx, gnorm=gnorm, nfev=nfev, status=status, valid=valid)


def debug_print_state(state, prefix: str = "") -> None:
    """Console trace of one solver state — the jittable analog of the
    reference's commented iteration prints (LBFGS.h:132-134,
    LBFGSB.h:208-210).  Call from a custom driver loop; unsupported on the
    remote-TPU backend (use CPU or interpret mode)."""
    gnorm = state.projgnorm if hasattr(state, "projgnorm") else state.gnorm
    jax.debug.print(
        prefix + "iter {k}: fx = {fx}, ||grad|| = {g}, nfev = {n}, "
        "status = {s}",
        k=state.k, fx=state.fx, g=gnorm, n=state.nfev, s=state.status)
