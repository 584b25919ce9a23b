"""Sharded (feature-axis) solve tests on a virtual 8-device CPU mesh.

Validates the SURVEY.md §5 communication design: a shard_map-ped solve over
a 1-D mesh must reproduce the single-device trajectory exactly (the psum'd
reductions are the same sums), for both the separable local_fun path and the
non-separable local_fun_and_grad path (logistic regression).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.parallel.sharded import (minimize_sharded, make_sharded_fg,
                                          sharding_for)
from lbfgspp_tpu.utils.objectives import (make_sharded_logreg, rosenbrock,
                                          quadratic)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= NDEV
    return jax.sharding.Mesh(np.asarray(jax.devices()[:NDEV]), ("feat",))


def test_separable_quadratic_matches_single(mesh):
    n = 64
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal(n) * 3.0)

    def global_fun(x):
        return jnp.sum((x - d) ** 2)

    x0 = jnp.asarray(rng.standard_normal(n))
    ref = minimize(global_fun, x0, LBFGSParams(epsilon=1e-8))

    d_parts = d.reshape(NDEV, -1)

    # Each shard's partial objective uses its own slice of d, fetched by
    # axis index inside shard_map.
    def local_fun(x_local):
        idx = jax.lax.axis_index("feat")
        d_local = jax.lax.dynamic_index_in_dim(d_parts, idx, 0,
                                               keepdims=False)
        return jnp.sum((x_local - d_local) ** 2)

    res = minimize_sharded(local_fun, x0, LBFGSParams(epsilon=1e-8),
                           mesh=mesh)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    # fx at the minimum is ~1e-28; psum tree order vs flat sum differ there
    np.testing.assert_allclose(float(res.fx), float(ref.fx),
                               rtol=1e-10, atol=1e-20)


def test_rosenbrock_sharded_matches_single(mesh):
    """Pairwise Rosenbrock is separable across even shard boundaries."""
    n = 64
    x0 = jnp.zeros((n,))
    p = LBFGSParams(epsilon=1e-6, max_iterations=200)
    ref = minimize(rosenbrock, x0, p)

    res = minimize_sharded(rosenbrock, x0, p, mesh=mesh)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_rinv_direction_sharded_matches_single(mesh):
    """``direction="rinv"`` under shard_map: the R^{-1} maintenance and
    application run on replicated [m, m] state fed by the same fused psums
    as the sweeps path, so the sharded trajectory must match the
    single-device rinv trajectory (same contract as the sweeps tests)."""
    n = 64
    x0 = jnp.zeros((n,))
    p = LBFGSParams(epsilon=1e-6, max_iterations=200)
    ref = minimize(rosenbrock, x0, p, direction="rinv")

    res = minimize_sharded(rosenbrock, x0, p, mesh=mesh, direction="rinv")
    assert res.history.rinv is not None
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_logreg_fun_and_grad_matches_replicated(mesh):
    """Non-separable objective with its own collective (one psum per
    evaluation): sharded solve == replicated solve."""
    rng = np.random.default_rng(7)
    batch, n = 48, 64
    a = rng.standard_normal((batch, n)) / np.sqrt(n)
    w_true = rng.standard_normal(n)
    b = np.sign(a @ w_true + 0.1 * rng.standard_normal(batch))
    aj = jnp.asarray(a)
    bj = jnp.asarray(b)

    def global_fg(w):
        logits = aj @ w
        z = -bj * logits
        fx = jnp.sum(jnp.logaddexp(0.0, z))
        g = aj.T @ (-bj * jax.nn.sigmoid(z))
        return fx, g

    p = LBFGSParams(epsilon=1e-6, max_iterations=500)
    x0 = jnp.zeros((n,))
    ref = minimize(fun_and_grad=global_fg, x0=x0, params=p)

    a_parts = aj.reshape(batch, NDEV, n // NDEV).transpose(1, 0, 2)

    def local_fg(w_local):
        idx = jax.lax.axis_index("feat")
        a_local = jax.lax.dynamic_index_in_dim(a_parts, idx, 0,
                                               keepdims=False)
        return make_sharded_logreg(a_local, bj, "feat")(w_local)

    res = minimize_sharded(local_fun_and_grad=local_fg, x0=x0, params=p,
                           mesh=mesh)
    assert int(res.niter) == int(ref.niter)
    np.testing.assert_allclose(float(res.fx), float(ref.fx), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)


def test_sharding_placement(mesh):
    """Result vectors come back sharded over the mesh, scalars replicated."""
    n = 32
    x0 = jnp.zeros((n,))
    res = minimize_sharded(quadratic, x0,
                           LBFGSParams(epsilon=1e-8), mesh=mesh)
    x_sharding = res.x.sharding
    assert x_sharding.spec == P("feat")
    # `quadratic` sees the *local* shard, so each shard pulls toward the
    # local arange — the global solution tiles it.
    want = np.tile(np.arange(n // NDEV, dtype=float), NDEV)
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-5)


def test_device_put_with_sharding_for(mesh):
    n = 32
    sh = sharding_for(mesh)
    x0 = jax.device_put(jnp.zeros((n,)), sh)
    res = minimize_sharded(quadratic, x0, LBFGSParams(epsilon=1e-8),
                           mesh=mesh)
    assert int(res.status) in (1, 2)


def test_2d_mesh_batch_by_feature():
    """Compose the two parallel axes on one 2-D mesh: batch-parallel
    instances (data axis) x feature-sharded vectors (model axis) — the
    dp x tp layout of a production fleet.  4 x 2 virtual devices: each
    batch shard runs its instances with x sharded over 2 feature shards;
    results must match the plain single-device vmap solve."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.parallel import collectives as coll

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("batch", "feat"))
    B, n = 8, 32
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(-2.0, 2.0, (B, n)))
    x0 = jnp.zeros((B, n))
    params = LBFGSParams(epsilon=1e-10, max_iterations=60)

    # reference: plain vmap, one device
    def fg_full(x, di):
        r = x - di
        return jnp.sum(r * r * (1.0 + 0.1 * di * di)), \
            2.0 * r * (1.0 + 0.1 * di * di)

    ref = jax.vmap(lambda x, di: lbfgs.minimize(
        fun_and_grad=lambda xx: fg_full(xx, di), x0=x, params=params))(x0, d)

    # 2-D: shard_map over both axes; each batch shard vmaps over its local
    # instances, each instance feature-sharded over "feat".  check_vma is
    # off: the per-shard data varies over "batch", and lax.cond branches in
    # the line search carry inconsistent varying-axis annotations relative
    # to that second manual axis (a type-system artifact, not a numerics
    # issue — correctness is asserted against the plain vmap solve below).
    def solve_local(x0_local, d_local):
        def one(x_loc, d_loc):
            def fg(x):
                r = x - d_loc
                w = 1.0 + 0.1 * d_loc * d_loc
                return coll.psum_scalar(jnp.sum(r * r * w), "feat"), \
                    2.0 * r * w
            return lbfgs.minimize(fun_and_grad=fg, x0=x_loc, params=params,
                                  axis_name="feat")
        return jax.vmap(one)(x0_local, d_local)

    from lbfgspp_tpu.parallel.sharded import _result_specs
    spec_in = P("batch", "feat")
    out_spec = jax.tree.map(
        lambda s: P(*(("batch",) + tuple(sn for sn in s))),
        _result_specs("feat"),
        is_leaf=lambda s: isinstance(s, P))
    shm = jax.jit(jax.shard_map(solve_local, mesh=mesh,
                                in_specs=(spec_in, spec_in),
                                out_specs=out_spec, check_vma=False))
    res = shm(x0, d)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(ref.niter))


def test_sharded_restart_matches_single_device():
    """on_ls_fail="restart" under feature sharding: the soft history
    reset (ncorr/theta scalars) is replicated state, so the sharded
    trajectory must equal the unsharded one exactly — including through
    restarts triggered by the capped search."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from lbfgspp_tpu import LBFGSParams, minimize
    from lbfgspp_tpu.parallel.sharded import minimize_sharded, sharding_for

    mesh = Mesh(np.asarray(jax.devices()), ("feat",))
    n = 64
    d = jnp.asarray(np.random.default_rng(3).uniform(0.5, 4.0, n),
                    jnp.float32)

    def local_fun(x_l):
        i = jax.lax.axis_index("feat")
        k = n // mesh.size
        dl = jax.lax.dynamic_slice_in_dim(d, i * k, k)
        return jnp.sum(dl * (x_l - 1.0) ** 2 + 0.05 * (x_l - 1.0) ** 4)

    def global_fun(x):
        return jnp.sum(d * (x - 1.0) ** 2 + 0.05 * (x - 1.0) ** 4)

    # capped search + tight epsilon in f32: restarts actually fire
    p = LBFGSParams(epsilon=1e-6, max_iterations=200, max_linesearch=1)
    x0 = jnp.full((n,), -2.0, jnp.float32)
    ru = minimize(global_fun, x0, p, on_ls_fail="restart")
    rs = minimize_sharded(local_fun, jax.device_put(x0, sharding_for(mesh)),
                          p, mesh=mesh, on_ls_fail="restart")
    assert int(rs.niter) == int(ru.niter)
    assert int(rs.status) == int(ru.status)
    # the shard-partial objective reassociates the f32 reduction, so the
    # iterates may differ by ~1 ulp (the trajectory/restart DECISIONS
    # match exactly, per the niter/status equality above)
    np.testing.assert_allclose(np.asarray(rs.x), np.asarray(ru.x),
                               rtol=0, atol=3e-6)
