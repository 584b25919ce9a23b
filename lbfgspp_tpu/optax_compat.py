"""optax interop: run this framework's L-BFGS inside an optax training loop.

``optax`` ships its own ``optax.lbfgs``; what this module provides instead is
the REFERENCE solver (LBFGS.h:79-173 semantics: Nocedal-Wright / Moré-Thuente
/ backtracking / bracketing line searches, curvature gate, ring-buffer
history, status codes) behind optax's ``GradientTransformationExtraArgs``
protocol, so code structured around ``optax.apply_updates`` can adopt it
without restructuring:

    import optax
    from lbfgspp_tpu import optax_compat

    opt = optax_compat.lbfgs(LBFGSParams(m=8))
    state = opt.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss)   # composes
    for _ in range(steps):
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=loss)
        params = optax.apply_updates(params, updates)

Each ``update`` runs ONE outer solver iteration (line search included, via
``value_fn``); the returned updates are ``x_{k+1} - x_k``.  Parameters may be
any pytree (raveled internally, as in :mod:`.pytree`).  Once the solver
terminates (convergence or failure — ``optax_compat.status(state)``), further
updates are zero, so a fixed-step loop is safe.

The wrapper state exposes ``value``/``grad`` fields holding the objective and
gradient at the current iterate, which is exactly what
``optax.value_and_grad_from_state`` looks up to skip re-evaluations — the
line search's final evaluation is reused as the next step's value/grad, the
same economy the reference gets by threading ``fx``/``grad`` through its
loop (LBFGS.h:127-135).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from . import lbfgs as _lbfgs
from .params import LBFGSParams
from .types import Status


class _HiddenCarry(NamedTuple):
    """``lbfgs.LBFGSState`` with the ``grad``/``fx`` fields under
    non-colliding names: ``optax.tree_utils.tree_get`` (the machinery
    behind ``value_and_grad_from_state``) searches the whole state tree by
    field NAME and errors on duplicates, so the wrapper-level ``value`` /
    ``grad`` fields must be the only ones so named.  Field order matches
    ``LBFGSState`` exactly — conversion is positional."""

    k: Any
    x: Any
    fx_: Any
    g_: Any
    gnorm: Any
    drt: Any
    step: Any
    hist: Any
    fx_ring: Any
    done: Any
    status: Any
    nfev: Any


def _hide(inner) -> "_HiddenCarry":
    return _HiddenCarry(*inner)


def _show(carry: "_HiddenCarry"):
    return _lbfgs.LBFGSState(*carry)


class LBFGSOptState(NamedTuple):
    """optax state: the solver carry + value/grad in optax's naming.

    ``value`` and ``grad`` (a pytree like the params) are discoverable by
    ``optax.tree_utils.tree_get``, which is how
    ``optax.value_and_grad_from_state`` finds and reuses them.
    """

    inner: Any            # _HiddenCarry over the raveled parameters
    value: jax.Array      # objective at the current iterate (inf before #0)
    grad: Any             # gradient pytree at the current iterate
    initialized: jax.Array  # bool: becomes True at the first update


def lbfgs(params: LBFGSParams = LBFGSParams(),
          *,
          line_search: str = "nocedalwright",
          history_dtype=None):
    """Build the optax transformation. See the module docstring.

    Requires ``value`` and ``value_fn`` as update extra-args (``grad``
    defaults to the positional ``grads``) — the same contract as
    ``optax.lbfgs`` with a line search.
    """
    import optax

    def _solver_for(value_fn, unravel):
        def fg_flat(z):
            return jax.value_and_grad(lambda w: value_fn(unravel(w)))(z)
        return _lbfgs.solver(fun_and_grad=fg_flat, params=params,
                            line_search=line_search,
                            history_dtype=history_dtype)

    def init_fn(parameters):
        flat, unravel = ravel_pytree(parameters)
        # Shape-complete dummy carry (no objective available yet): the
        # first update replaces it via Solver.init with the caller's
        # (value, grad).  Built with a constant-zero oracle so nothing is
        # evaluated.
        s = _lbfgs.solver(fun_and_grad=lambda z: (jnp.zeros((), z.dtype),
                                                 jnp.zeros_like(z)),
                         params=params, line_search=line_search,
                         history_dtype=history_dtype)
        inner = s.init(flat, fg0=(jnp.asarray(jnp.inf, flat.dtype),
                                  jnp.zeros_like(flat)))
        return LBFGSOptState(
            inner=_hide(inner),
            value=jnp.asarray(jnp.inf, flat.dtype),
            grad=jax.tree.map(jnp.zeros_like, parameters),
            initialized=jnp.zeros((), bool))

    def update_fn(grads, state, parameters=None, *, value, value_fn,
                  grad=None, **extra):
        del extra
        if parameters is None:
            raise ValueError("lbfgspp_tpu.optax_compat.lbfgs requires "
                             "params in update(...)")
        g_tree = grads if grad is None else grad
        flat, unravel = ravel_pytree(parameters)
        gflat = ravel_pytree(g_tree)[0]
        s = _solver_for(value_fn, unravel)

        fresh = s.init(flat, fg0=(jnp.asarray(value, flat.dtype), gflat))
        inner = jax.tree.map(
            lambda a, b: jnp.where(state.initialized, a, b),
            state.inner, _hide(fresh))
        nxt = s.step(_show(inner))

        updates = unravel(nxt.x - flat)
        new_state = LBFGSOptState(
            inner=_hide(nxt),
            value=nxt.fx,
            grad=unravel(nxt.grad),
            initialized=jnp.ones((), bool))
        return updates, new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def status(state: LBFGSOptState) -> jax.Array:
    """The solver's :class:`~.types.Status` code at the current iterate
    (``RUNNING`` while optimizing; convergence / line-search failure codes
    mirror the reference's return/throw sites)."""
    return state.inner.status


def niter(state: LBFGSOptState) -> jax.Array:
    """Outer solver iterations completed so far (reference return value,
    LBFGS.h:76)."""
    return state.inner.k
