"""Sortless segment-walk GCP and the sharded L-BFGS-B path.

`cauchy_point_walk` is the feature-sharded GCP: no sort, 2 collectives per
crossed break-point group, order-independent group updates.  It must agree
with the sequential scan walk on randomized structural cases, and the
full sharded box solver must reproduce the single-device solve on the
8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbfgspp_tpu.ops import bmat, cauchy
from lbfgspp_tpu import LBFGSBParams, minimize_b
from lbfgspp_tpu.parallel.sharded import minimize_b_sharded


def _random_bhistory(rng, n, m, ncorr):
    bh = bmat.init_b_history(n, m, jnp.float64)
    for _ in range(ncorr):
        s = jnp.asarray(rng.standard_normal(n))
        y = s * rng.uniform(0.5, 2.0) + 0.1 * jnp.asarray(
            rng.standard_normal(n))
        bh = bmat.add_correction_b(bh, s, y, jnp.asarray(True))
    return bh


@pytest.mark.parametrize("seed", range(16))
def test_walk_matches_scan(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(3, 24))
    m = 6
    bh = _random_bhistory(rng, n, m, int(rng.integers(0, 2 * m)))

    lb = rng.uniform(-2.0, 0.0, n)
    ub = rng.uniform(0.5, 2.5, n)
    if seed % 3 == 0:
        k = rng.integers(0, n)
        lb[k] = ub[k] = rng.uniform(-1, 1)
    if seed % 4 == 0:
        lb[rng.integers(0, n)] = -np.inf
        ub[rng.integers(0, n)] = np.inf
    x0 = np.clip(rng.uniform(-2.0, 2.5, n), lb, ub)
    g = rng.standard_normal(n)
    if seed % 2 == 0 and n >= 4:
        g[0] = abs(g[0]) + 0.5
        g[1] = g[0]
        lb[0] = x0[0] - 0.7 * g[0]
        lb[1] = x0[1] - 0.7 * g[1]          # exact break-point tie

    args = (bh, jnp.asarray(x0), jnp.asarray(g), jnp.asarray(lb),
            jnp.asarray(ub))
    r_scan = cauchy.cauchy_point(*args)
    r_walk = cauchy.cauchy_point_walk(*args)

    np.testing.assert_array_equal(np.asarray(r_scan.newact_mask),
                                  np.asarray(r_walk.newact_mask))
    np.testing.assert_array_equal(np.asarray(r_scan.free_mask),
                                  np.asarray(r_walk.free_mask))
    np.testing.assert_allclose(np.asarray(r_walk.xcp),
                               np.asarray(r_scan.xcp),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_walk.vecc),
                               np.asarray(r_scan.vecc),
                               rtol=1e-9, atol=1e-11)


def _box_quadratic_setup(n):
    """Separable quadratic with many active bounds at the optimum."""
    rng = np.random.default_rng(0)
    d = rng.uniform(-3.0, 3.0, n)            # unconstrained optimum
    w = rng.uniform(0.5, 4.0, n)             # per-coordinate curvature
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    x0 = np.clip(rng.uniform(-1.0, 1.0, n), lb, ub)
    return d, w, lb, ub, x0


def test_sharded_lbfgsb_matches_single_device():
    n = 64
    d, w, lb, ub, x0 = _box_quadratic_setup(n)
    dj = jnp.asarray(d)
    wj = jnp.asarray(w)

    def fun(x):
        return jnp.sum(wj * (x - dj) ** 2)

    params = LBFGSBParams(epsilon=1e-8, max_iterations=100)
    ref = minimize_b(fun, jnp.asarray(x0), jnp.asarray(lb), jnp.asarray(ub),
                     params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("feat",))
    k = n // 8

    def local_fun(x_local):
        i = jax.lax.axis_index("feat")
        dl = jax.lax.dynamic_slice_in_dim(dj, i * k, k)
        wl = jax.lax.dynamic_slice_in_dim(wj, i * k, k)
        return jnp.sum(wl * (x_local - dl) ** 2)

    res = minimize_b_sharded(local_fun, jnp.asarray(x0), lb, ub, params,
                             mesh=mesh)
    assert res.x.shape == (n,)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(res.fx), float(ref.fx), rtol=1e-10)
    # the solution actually pins coordinates at both bounds
    at_bounds = np.sum((np.abs(np.asarray(res.x) - lb) < 1e-12) |
                       (np.abs(np.asarray(res.x) - ub) < 1e-12))
    assert at_bounds >= n // 4


def test_sharded_lbfgsb_trajectory_matches_walk_single_device():
    """Trajectory-exactness: the sharded solve must take the same number
    of iterations as the single-device solve using the same (walk) GCP."""
    n = 32
    d, w, lb, ub, x0 = _box_quadratic_setup(n)
    dj, wj = jnp.asarray(d), jnp.asarray(w)

    def fun(x):
        return jnp.sum(wj * (x - dj) ** 2)

    from lbfgspp_tpu import lbfgsb
    params = LBFGSBParams(epsilon=1e-8, max_iterations=100)
    s = lbfgsb.solver(fun, jnp.asarray(lb), jnp.asarray(ub), params,
                      gcp="walk")
    ref = s.finalize(s.run(s.init(jnp.asarray(x0))))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("feat",))
    k = n // 8

    def local_fun(x_local):
        i = jax.lax.axis_index("feat")
        dl = jax.lax.dynamic_slice_in_dim(dj, i * k, k)
        wl = jax.lax.dynamic_slice_in_dim(wj, i * k, k)
        return jnp.sum(wl * (x_local - dl) ** 2)

    res = minimize_b_sharded(local_fun, jnp.asarray(x0), lb, ub, params,
                             mesh=mesh)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_sharded_solver_routes_singledevice_gcp_to_walk():
    """lbfgsb.solver(axis_name=..., gcp="scan"/"prefix") must route to the
    segment-walk GCP: scan and prefix are single-device formulations whose
    reductions carry no collectives, so under sharding each shard would
    silently compute a GCP for its local slice as if it were the whole
    problem.  (The walk path itself is exercised end-to-end by the
    minimize_b_sharded tests above, whose solver default "scan" takes this
    same routing.)"""
    from lbfgspp_tpu.lbfgsb import _resolve_gcp

    assert _resolve_gcp("scan", "feat") == "walk"
    assert _resolve_gcp("prefix", "feat") == "walk"
    assert _resolve_gcp("walk", "feat") == "walk"
    for gcp in ("scan", "prefix", "walk"):
        assert _resolve_gcp(gcp, None) == gcp


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("chunk", [2, 7, 64])
def test_walk_chunked_matches_walk(seed, chunk):
    """The K-chunked walk applies the same group recurrence K values at a
    time; index sets must be identical and values equal to reassociation
    tolerance."""
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(3, 24))
    m = 6
    bh = _random_bhistory(rng, n, m, int(rng.integers(0, 2 * m)))

    lb = rng.uniform(-2.0, 0.0, n)
    ub = rng.uniform(0.5, 2.5, n)
    if seed % 3 == 0:
        k = rng.integers(0, n)
        lb[k] = ub[k] = rng.uniform(-1, 1)
    if seed % 4 == 0:
        lb[rng.integers(0, n)] = -np.inf
        ub[rng.integers(0, n)] = np.inf
    x0 = np.clip(rng.uniform(-2.0, 2.5, n), lb, ub)
    g = rng.standard_normal(n)
    if seed % 6 == 0:
        g[rng.integers(0, n)] = 0.0           # free coordinate
    if seed % 2 == 0 and n >= 4:
        g[0] = abs(g[0]) + 0.5
        g[1] = g[0]
        lb[0] = x0[0] - 0.7 * g[0]
        lb[1] = x0[1] - 0.7 * g[1]            # exact break-point tie

    args = (bh, jnp.asarray(x0), jnp.asarray(g), jnp.asarray(lb),
            jnp.asarray(ub))
    r_walk = cauchy.cauchy_point_walk(*args)
    r_ch = cauchy.cauchy_point_walk_chunked(*args, chunk=chunk)

    np.testing.assert_array_equal(np.asarray(r_walk.newact_mask),
                                  np.asarray(r_ch.newact_mask))
    np.testing.assert_array_equal(np.asarray(r_walk.free_mask),
                                  np.asarray(r_ch.free_mask))
    np.testing.assert_allclose(np.asarray(r_ch.xcp),
                               np.asarray(r_walk.xcp),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_ch.vecc),
                               np.asarray(r_walk.vecc),
                               rtol=1e-9, atol=1e-11)


def test_sharded_lbfgsb_walk_chunked_matches_single_device():
    """Full sharded solve routed through gcp="walk_chunked" (collective
    top-k/all_gather/fused-psum path) reproduces the single-device
    solution on the 8-device mesh."""
    n = 64
    d, w, lb, ub, x0 = _box_quadratic_setup(n)
    dj = jnp.asarray(d)
    wj = jnp.asarray(w)

    def fun(x):
        return jnp.sum(wj * (x - dj) ** 2)

    params = LBFGSBParams(epsilon=1e-8, max_iterations=100)
    ref = minimize_b(fun, jnp.asarray(x0), jnp.asarray(lb), jnp.asarray(ub),
                     params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("feat",))
    k = n // 8

    def local_fun(x_local):
        i = jax.lax.axis_index("feat")
        dl = jax.lax.dynamic_slice_in_dim(dj, i * k, k)
        wl = jax.lax.dynamic_slice_in_dim(wj, i * k, k)
        return jnp.sum(wl * (x_local - dl) ** 2)

    res = minimize_b_sharded(local_fun, jnp.asarray(x0), lb, ub, params,
                             mesh=mesh, gcp="walk_chunked")
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(res.fx), float(ref.fx), rtol=1e-10)


@pytest.mark.parametrize("c", [4, 200])
def test_walk_auto_matches_walk(c):
    """walk_auto routes by the estimated crossing count (>= 16 ->
    chunked; round-5 measured threshold) and must reproduce the plain
    walk's GCP in BOTH regimes (the chunked branch up to its documented
    reduction reassociation)."""
    n, m = 512, 6
    rng = np.random.default_rng(c)
    bh = bmat.init_b_history(n, m, jnp.float64)
    x0 = jnp.zeros(n, jnp.float64)
    g = jnp.ones(n, jnp.float64)
    lb = np.full(n, -100.0)
    idx = rng.choice(n, size=c, replace=False)
    lb[idx] = -(0.05 + 0.85 * rng.random(c))
    lb = jnp.asarray(lb)
    ub = jnp.full(n, 100.0, jnp.float64)

    ref = cauchy.cauchy_point_walk(bh, x0, g, lb, ub)
    auto = jax.jit(lambda *a: cauchy.cauchy_point_walk_auto(*a))(
        bh, x0, g, lb, ub)
    np.testing.assert_allclose(np.asarray(auto.xcp), np.asarray(ref.xcp),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(auto.vecc), np.asarray(ref.vecc),
                               rtol=1e-10, atol=1e-12)


def test_sharded_auto_routes_and_solves():
    """minimize_b_sharded's default gcp="auto" (round 5) must solve the
    sharded box problem to the same solution as the pinned walk."""
    from lbfgspp_tpu.parallel.sharded import minimize_b_sharded, sharding_for
    from jax.sharding import Mesh

    n = 64
    d = jnp.asarray(np.random.default_rng(3).uniform(-3, 3, n))
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("feat",))

    def local_quad(x_local):
        i = jax.lax.axis_index("feat")
        k = n // 8
        dl = jax.lax.dynamic_slice_in_dim(d, i * k, k)
        return jnp.sum((x_local - dl) ** 2)

    x0 = jax.device_put(jnp.zeros(n), sharding_for(mesh))
    res = jax.jit(lambda x: minimize_b_sharded(
        local_quad, x, lb, ub, LBFGSBParams(epsilon=1e-6,
                                            max_iterations=60),
        mesh=mesh))(x0)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.clip(np.asarray(d), lb, ub), atol=1e-5)
