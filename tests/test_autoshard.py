"""GSPMD auto-partitioned solves: `jax.jit` with sharded inputs, no
shard_map, no local-partial-objective contract.

The solvers are pure jnp programs with static shapes, so XLA's SPMD
partitioner can shard them directly: put `x0` (and `lb`/`ub`) on a
1-D mesh via `NamedSharding` and jit the ordinary `minimize` /
`minimize_b` — the compiler inserts the collectives that
`parallel/sharded.py` writes by hand.  This is the zero-code-change
scaling path for objectives written against the GLOBAL vector (the
shard_map path remains the explicit-contract option where the user
wants to write per-shard partial objectives, control collective
placement, or use the chunked GCP).

These tests pin that the auto-partitioned program reproduces the
single-device trajectory exactly (same iteration count, bitwise-equal
x) for both solver families — the reductions GSPMD inserts are the
same sums the solver computes unsharded.

Requires n divisible by the mesh size (a NamedSharding constraint).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbfgspp_tpu import (LBFGSParams, LBFGSBParams, minimize, minimize_b,
                         minimize_owlqn)
from lbfgspp_tpu.utils.objectives import rosenbrock

NDEV = 8


@pytest.fixture(scope="module")
def feat_sharding():
    assert jax.device_count() >= NDEV
    mesh = Mesh(np.asarray(jax.devices()[:NDEV]), ("feat",))
    return NamedSharding(mesh, P("feat"))


def test_lbfgs_autoshard_matches_single_device(feat_sharding):
    params = LBFGSParams(epsilon=1e-6, max_iterations=200)
    x0 = jnp.zeros(64, dtype=jnp.float64)

    ref = minimize(rosenbrock, x0, params)
    fn = jax.jit(lambda x: minimize(rosenbrock, x, params),
                 in_shardings=feat_sharding)
    res = fn(jax.device_put(x0, feat_sharding))

    assert int(res.niter) == int(ref.niter)
    assert int(res.status) == int(ref.status)
    # Bit-exact x equality held until round 5's concat-free
    # correction_products; the GSPMD partitioning of the split einsums
    # reassociates the Gram reductions, so the sharded trajectory drifts
    # at rounding scale (niter/status still exactly equal).  XLA does
    # not promise bit-identical lowering across layouts — tolerance per
    # test_minimize_batched_over_mesh's documented contract.
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=1e-9)
    # the solution array stays sharded — no implicit gather at the end
    assert res.x.sharding.is_equivalent_to(feat_sharding, res.x.ndim)


def test_lbfgsb_autoshard_matches_single_device(feat_sharding):
    n = 64
    params = LBFGSBParams(epsilon=1e-6)
    x0 = jnp.zeros(n, dtype=jnp.float64)
    lb = jnp.full(n, -0.5)
    ub = jnp.full(n, 0.8)

    ref = minimize_b(rosenbrock, x0, lb, ub, params)
    fn = jax.jit(lambda x, l, u: minimize_b(rosenbrock, x, l, u, params),
                 in_shardings=(feat_sharding,) * 3)
    res = fn(*(jax.device_put(a, feat_sharding) for a in (x0, lb, ub)))

    assert int(res.niter) == int(ref.niter)
    assert int(res.status) == int(ref.status)
    # Bit-exact x equality held until round 5's concat-free
    # correction_products; the GSPMD partitioning of the split einsums
    # reassociates the Gram reductions, so the sharded trajectory drifts
    # at rounding scale (niter/status still exactly equal).  XLA does
    # not promise bit-identical lowering across layouts — tolerance per
    # test_minimize_batched_over_mesh's documented contract.
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=1e-9)


def test_owlqn_autoshard_matches_single_device(feat_sharding):
    """OWL-QN's masked orthant arithmetic partitions the same way."""
    n = 64
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.uniform(-3.0, 3.0, n))
    lam = 0.5
    params = LBFGSParams(epsilon=1e-8, max_iterations=100)

    def quad(x):
        return 0.5 * jnp.sum((x - d) ** 2)

    x0 = jnp.zeros(n, dtype=jnp.float64)
    ref = jax.jit(lambda x: minimize_owlqn(quad, x, lam, params))(x0)
    fn = jax.jit(lambda x: minimize_owlqn(quad, x, lam, params),
                 in_shardings=feat_sharding)
    res = fn(jax.device_put(x0, feat_sharding))

    assert int(res.niter) == int(ref.niter)
    # GSPMD reassociates this program's psum-free reductions (measured
    # ulp-level: max diff ~3e-15), so assert trajectory-equivalence, not
    # bit equality: same sparsity pattern, same solution to f64 tolerance.
    assert bool(jnp.all((res.x == 0) == (ref.x == 0)))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-13)
    soft = np.sign(np.asarray(d)) * np.maximum(np.abs(np.asarray(d)) - lam, 0)
    np.testing.assert_allclose(np.asarray(res.x), soft, atol=1e-6)


def test_batched_autoshard_data_parallel(feat_sharding):
    """vmapped solves shard along the batch axis the same way."""
    mesh = feat_sharding.mesh
    batch_sh = NamedSharding(mesh, P("feat", None))  # batch on the mesh axis
    params = LBFGSParams(epsilon=1e-5, max_iterations=400,
                         max_linesearch=256)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(-2, 2, (32, 10)))

    # jit the reference too: eager vmap dispatches per-op with different
    # reduction lowering, which perturbs trajectories at the ulp level
    ref = jax.jit(jax.vmap(lambda x: minimize(rosenbrock, x, params)))(xs)
    fn = jax.jit(jax.vmap(lambda x: minimize(rosenbrock, x, params)),
                 in_shardings=batch_sh)
    res = fn(jax.device_put(xs, batch_sh))

    assert bool(jnp.all(res.niter == ref.niter))
    assert bool(jnp.all(res.x == ref.x))


def test_batched_autoshard_2d_mesh():
    """dp x feat 2-D mesh: batch on one axis, features on the other.

    Partitioning the feature axis reassociates each instance's
    reductions, so trajectories diverge at the ulp level and compound
    over iterations — bit parity does NOT hold here (unlike the 1-D
    cases above, where the reduction structure is unchanged).  The
    honest contract is convergence: every instance must still meet the
    reference's multistart criterion (max|x_i - 1| <= 1e-4,
    example-rosenbrock-bracketing.cpp:50-54)."""
    assert jax.device_count() >= NDEV
    mesh = Mesh(np.asarray(jax.devices()[:NDEV]).reshape(4, 2),
                ("dp", "feat"))
    sh2d = NamedSharding(mesh, P("dp", "feat"))
    params = LBFGSParams(epsilon=1e-5, max_iterations=400,
                         max_linesearch=256)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(-2, 2, (32, 16)))

    fn = jax.jit(jax.vmap(lambda x: minimize(rosenbrock, x, params)),
                 in_shardings=sh2d)
    res = fn(jax.device_put(xs, sh2d))

    assert bool(jnp.all(jnp.max(jnp.abs(res.x - 1.0), axis=1) <= 1e-4))
