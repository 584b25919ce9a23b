"""Benchmark objectives mirroring the reference example suite.

Each objective is provided both as a plain ``fun(x) -> fx`` (for
``jax.value_and_grad``) and as an explicit ``fun_and_grad`` using the same
hand-written gradient formulas as the reference examples, so iteration counts
can be compared bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rosenbrock(x: Array) -> Array:
    """Pairwise Rosenbrock from the reference examples
    (examples/example-rosenbrock.cpp:14-29): for even i,
    ``f += (1 - x_i)^2 + (10 (x_{i+1} - x_i^2))^2``.

    Implementation note: the pairs are accessed via ``reshape(-1, 2)``
    instead of strided ``x[0::2]`` slicing — identical values and
    summation order, but the AD transpose of a strided slice is a scatter,
    which lowers ~7x slower on TPU (PERF.md)."""
    p = x.reshape(-1, 2)
    xe = p[:, 0]
    xo = p[:, 1]
    t1 = 1.0 - xe
    t2 = 10.0 * (xo - xe * xe)
    return jnp.sum(t1 * t1 + t2 * t2)


def rosenbrock_split(x: Array) -> Array:
    """Pairwise Rosenbrock with the SPLIT pair layout: pair i is
    ``(x_i, x_{i + n/2})`` (first half = "even" coordinates, second half
    = "odd"), the same separable problem family as :func:`rosenbrock`
    (examples/example-rosenbrock.cpp:14-29) under a fixed index
    permutation — every instance/start distribution is isomorphic.

    Exists for LARGE n on TPU: :func:`rosenbrock`'s ``reshape(-1, 2)``
    produces a [n/2, 2] value whose minor dimension of 2 pads to the
    128-lane tile — a 64x-padded layout (17 GB at n=2^26) that the AOT
    compiler rejects for HBM capacity (measured round-5; this, not a
    compile-RPC buffer limit, was round-4's "2^26 rejection").  The
    split view ``reshape(2, -1)`` keeps the minor dimension large and
    contiguous, so the same solve compiles and streams at full lane
    occupancy at any n.
    """
    p = x.reshape(2, -1)
    xe = p[0]
    xo = p[1]
    t1 = 1.0 - xe
    t2 = 10.0 * (xo - xe * xe)
    return jnp.sum(t1 * t1 + t2 * t2)


def rosenbrock_fg(x: Array):
    """Value and hand-written gradient (example-rosenbrock.cpp:18-27)."""
    p = x.reshape(-1, 2)
    xe = p[:, 0]
    xo = p[:, 1]
    t1 = 1.0 - xe
    t2 = 10.0 * (xo - xe * xe)
    fx = jnp.sum(t1 * t1 + t2 * t2)
    go = 20.0 * t2
    ge = -2.0 * (xe * go + t1)
    grad = jnp.stack([ge, go], axis=1).reshape(x.shape)
    return fx, grad


def quadratic(x: Array) -> Array:
    """``f(x) = ||x - d||^2`` with ``d = (0, 1, ..., n-1)``
    (examples/example-quadratic.cpp:9-18)."""
    d = jnp.arange(x.shape[0], dtype=x.dtype)
    r = x - d
    return jnp.sum(r * r)


def quadratic_fg(x: Array):
    d = jnp.arange(x.shape[0], dtype=x.dtype)
    r = x - d
    return jnp.sum(r * r), 2.0 * r


def rosenbrock_chained(x: Array) -> Array:
    """roptim-style chained Rosenbrock used by the box example
    (examples/example-rosenbrock-box.cpp:12-35):
    ``f = (x_0 - 1)^2 + sum_i 4 (x_i - x_{i-1}^2)^2``."""
    head = (x[0] - 1.0) ** 2
    tail = 4.0 * (x[1:] - x[:-1] * x[:-1]) ** 2
    return head + jnp.sum(tail)


def make_sharded_logreg(a_local: Array, b: Array, axis_name: str):
    """Feature-sharded logistic regression oracle for
    :func:`..parallel.sharded.minimize_sharded` (the BASELINE.json
    "sharded n=1e9 logistic-regression fit" config).

    ``a_local`` is this shard's [batch, n_local] slice of the design matrix
    (features sharded), ``b`` the replicated +/-1 labels.  The logit is a dot
    over *all* features, so each shard contributes a partial matvec and one
    ``psum`` makes the logits global; the loss is then replicated and the
    gradient w.r.t. the local weight shard is local (A_local' d).  This is
    the non-separable ``local_fun_and_grad`` pattern: exactly one collective
    per objective evaluation.
    """
    import jax.nn
    from jax import lax

    def fg(w_local: Array):
        logits = lax.psum(a_local @ w_local, axis_name)
        z = -b * logits
        fx = jnp.sum(jnp.logaddexp(0.0, z))
        dlogit = -b * jax.nn.sigmoid(z)
        g_local = a_local.T @ dlogit
        return fx, g_local

    return fg


def rosenbrock_chained_fg(x: Array):
    """Value and the reference's hand-written gradient
    (example-rosenbrock-box.cpp:20-33)."""
    fx = rosenbrock_chained(x)
    n = x.shape[0]
    grad = jnp.zeros_like(x)
    grad = grad.at[0].set(2.0 * (x[0] - 1.0) +
                          16.0 * (x[0] * x[0] - x[1]) * x[0])
    mid = 8.0 * (x[1:] - x[:-1] * x[:-1])
    grad = grad.at[1:].set(mid)
    inner = 16.0 * (x[1:-1] * x[1:-1] - x[2:]) * x[1:-1]
    grad = grad.at[1:-1].add(inner)
    del n
    return fx, grad
