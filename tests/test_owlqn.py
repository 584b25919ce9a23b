"""OWL-QN (lbfgspp_tpu/owlqn.py): L1-regularized L-BFGS.

Ground truth is (a) a high-precision proximal-gradient (ISTA) solve run in
the test, and (b) the lasso KKT conditions, which the solution must satisfy
coordinate-wise: |grad_j| <= l1 where x_j == 0, grad_j + l1*sign(x_j) == 0
where x_j != 0.  Sparsity must be EXACT zeros (the orthant projection lands
on them), not small values.
"""

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgspp_tpu import LBFGSParams, Status
from lbfgspp_tpu.owlqn import minimize_owlqn, pseudo_gradient


def _lasso_problem(m=64, n=24, seed=0, noise=0.05, sparsity=6):
    key = jax.random.PRNGKey(seed)
    kA, kw, kn, ki = jax.random.split(key, 4)
    A = jax.random.normal(kA, (m, n)) / jnp.sqrt(m)
    w = jnp.zeros(n).at[jax.random.permutation(ki, n)[:sparsity]].set(
        jax.random.normal(kw, (sparsity,)) * 3.0)
    b = A @ w + noise * jax.random.normal(kn, (m,))
    return A, b


def _ista(A, b, lam, iters=200_000):
    """Proximal gradient with fixed step 1/L — slow but exact reference."""
    L = float(jnp.linalg.norm(A, 2) ** 2)
    t = 1.0 / L

    def step(x, _):
        g = A.T @ (A @ x - b)
        z = x - t * g
        x = jnp.sign(z) * jnp.maximum(jnp.abs(z) - t * lam, 0.0)
        return x, None

    x, _ = jax.lax.scan(step, jnp.zeros(A.shape[1]), None, length=iters)
    return x


def _loss_factory(A, b):
    return lambda x: 0.5 * jnp.sum((A @ x - b) ** 2)


def _kkt_violation(A, b, x, lam):
    g = np.asarray(A.T @ (A @ x - b))
    x = np.asarray(x)
    lam = np.broadcast_to(np.asarray(lam), x.shape)
    at_zero = x == 0
    v1 = np.maximum(np.abs(g[at_zero]) - lam[at_zero], 0.0)
    v2 = np.abs(g[~at_zero] + lam[~at_zero] * np.sign(x[~at_zero]))
    return max(v1.max(initial=0.0), v2.max(initial=0.0))


def test_pseudo_gradient_cases():
    x = jnp.array([1.0, -2.0, 0.0, 0.0, 0.0])
    g = jnp.array([0.3, 0.4, -2.0, 2.0, 0.5])
    lam = jnp.ones(5)
    pg = np.asarray(pseudo_gradient(x, g, lam))
    np.testing.assert_allclose(pg, [1.3, -0.6, -1.0, 1.0, 0.0])


def test_lasso_matches_ista_and_kkt():
    A, b = _lasso_problem()
    lam = 0.01
    fun = _loss_factory(A, b)

    # epsilon=1e-9: below ~3e-10 the Armijo decrease test sits on the f64
    # rounding floor and the search reports LS_MAX_LINESEARCH (with KKT
    # violation ~1e-10 — the same floor behavior the reference's
    # backtracking shows, PERF.md f32 capture).
    res = minimize_owlqn(fun, jnp.zeros(24), lam,
                         LBFGSParams(epsilon=1e-9, epsilon_rel=0.0,
                                     max_iterations=500))
    assert int(res.status) == Status.CONVERGED_GRAD
    assert _kkt_violation(A, b, res.x, lam) < 1e-8

    x_ref = _ista(A, b, lam)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref),
                               atol=1e-6)
    # Objective value parity.
    def obj(x):
        return float(fun(x) + lam * jnp.sum(jnp.abs(x)))
    assert obj(res.x) <= obj(x_ref) + 1e-10


def test_exact_sparsity():
    A, b = _lasso_problem(seed=2)
    lam = 0.05
    res = minimize_owlqn(_loss_factory(A, b), jnp.full(24, 0.5), lam,
                         LBFGSParams(epsilon=1e-10, epsilon_rel=0.0,
                                     max_iterations=500))
    x = np.asarray(res.x)
    x_ref = np.asarray(_ista(A, b, lam))
    # Zero coordinates are bit-exact zeros and the supports agree.
    assert (x[np.abs(x) < 1e-9] == 0.0).all()
    assert ((x == 0) == (np.abs(x_ref) < 1e-9)).all()
    assert (x == 0).sum() > 0


def test_strong_l1_gives_zero_solution():
    A, b = _lasso_problem(seed=3)
    lam = float(jnp.max(jnp.abs(A.T @ b))) * 1.01  # above the lasso lam_max
    res = minimize_owlqn(_loss_factory(A, b), jnp.ones(24) * 0.3, lam,
                         LBFGSParams(epsilon=1e-10, epsilon_rel=0.0,
                                     max_iterations=300))
    np.testing.assert_array_equal(np.asarray(res.x), 0.0)


def test_per_coordinate_weights_and_unpenalized():
    """l1 vector with zeros: those coordinates get plain quasi-Newton
    updates (an intercept term, classically)."""
    A, b = _lasso_problem(seed=4)
    lam = jnp.full(24, 0.02).at[0].set(0.0)  # coordinate 0 unpenalized
    res = minimize_owlqn(_loss_factory(A, b), jnp.zeros(24), lam,
                         LBFGSParams(epsilon=1e-10, epsilon_rel=0.0,
                                     max_iterations=500))
    assert _kkt_violation(A, b, res.x, lam) < 1e-8
    # The unpenalized coordinate is stationarity-exact, not thresholded:
    g = np.asarray(A.T @ (A @ res.x - b))
    assert abs(g[0]) < 1e-8


def test_regularization_path_vmap():
    """The whole lasso path in one launch: vmap over l1 values."""
    A, b = _lasso_problem(seed=5)
    fun = _loss_factory(A, b)
    lams = jnp.array([0.002, 0.01, 0.05, 0.2])

    path = jax.jit(jax.vmap(lambda lam: minimize_owlqn(
        fun, jnp.zeros(24), lam * jnp.ones(24),
        LBFGSParams(epsilon=1e-9, epsilon_rel=0.0, max_iterations=400))))
    res = path(lams)
    nnz = np.asarray((res.x != 0).sum(axis=1))
    # Sparsity is monotone (weakly) in the penalty.
    assert (np.diff(nnz) <= 0).all(), nnz
    for i, lam in enumerate(np.asarray(lams)):
        assert _kkt_violation(A, b, res.x[i], lam) < 1e-7


def test_sharded_matches_single_device():
    """Feature-sharded OWL-QN reproduces the single-device solve exactly
    on the 8-device mesh (separable smooth part -> additive partials)."""
    from jax.sharding import Mesh
    from lbfgspp_tpu.parallel.sharded import minimize_owlqn_sharded

    n = 8 * 16
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(size=n))
    lam_vec = jnp.asarray(rng.uniform(0.0, 0.1, size=n))

    def fun(x):
        return 0.5 * jnp.sum((x - target) ** 2)

    def local_fun(x_local):  # additive partial of the separable loss
        # Each shard holds its slice of the target: close over the global
        # and slice by axis index inside shard_map.
        import jax as _jax
        i = _jax.lax.axis_index("feat")
        nl = x_local.shape[0]
        tgt = _jax.lax.dynamic_slice_in_dim(target, i * nl, nl)
        return 0.5 * jnp.sum((x_local - tgt) ** 2)

    p = LBFGSParams(epsilon=1e-10, epsilon_rel=0.0, max_iterations=200)
    ref = minimize_owlqn(fun, jnp.zeros(n), lam_vec, p)

    mesh = Mesh(np.asarray(jax.devices()), ("feat",))
    res = minimize_owlqn_sharded(local_fun, jnp.zeros(n), lam_vec, p,
                                 mesh=mesh)
    assert int(res.niter) == int(ref.niter)
    # psum's 8-way tree reduction reassociates the scalar sums vs the
    # single-device reduction: agreement to a few ulps, same trajectory.
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=1e-13)
    # Zero coordinates stay EXACT zeros under sharding too.
    np.testing.assert_array_equal(np.asarray(res.x) == 0,
                                  np.asarray(ref.x) == 0)
    # Soft-thresholded closed form for this quadratic: x = S(target, lam).
    want = np.sign(np.asarray(target)) * np.maximum(
        np.abs(np.asarray(target)) - np.asarray(lam_vec), 0.0)
    np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-9)


def test_fx_is_full_objective():
    A, b = _lasso_problem(seed=6)
    fun = _loss_factory(A, b)
    lam = 0.03
    res = minimize_owlqn(fun, jnp.zeros(24), lam,
                         LBFGSParams(epsilon=1e-9, max_iterations=400))
    want = float(fun(res.x) + lam * jnp.sum(jnp.abs(res.x)))
    assert float(res.fx) == pytest.approx(want, rel=1e-12)


def test_fast_phase_epsilon_two_phase_schedule():
    """The two-phase matmul-precision schedule must reach the same solution
    as a single-phase solve (on CPU the precision context is a no-op, so
    this pins the restart/merge plumbing: counters accumulate, phase-2
    endgame converges from the phase-1 iterate, zeros stay exact)."""
    A, b = _lasso_problem()
    lam = 0.02
    p = LBFGSParams(epsilon=1e-6, epsilon_rel=0.0, max_iterations=200)
    ref = minimize_owlqn(_loss_factory(A, b), jnp.zeros(A.shape[1]), lam, p)
    two = minimize_owlqn(_loss_factory(A, b), jnp.zeros(A.shape[1]), lam, p,
                         fast_phase_epsilon=1e-3)
    assert int(two.status) == Status.CONVERGED_GRAD
    assert float(two.gnorm) <= 1e-6
    np.testing.assert_allclose(np.asarray(two.x), np.asarray(ref.x),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(two.x) == 0,
                                  np.asarray(ref.x) == 0)
    # phase-1 + phase-2 counters both contribute
    assert int(two.niter) > int(
        minimize_owlqn(_loss_factory(A, b), jnp.zeros(A.shape[1]), lam,
                       LBFGSParams(epsilon=1e-3, epsilon_rel=0.0,
                                   max_iterations=200)).niter)


def test_fast_phase_epsilon_vmap():
    """The schedule composes with vmap (the batched-lasso use case)."""
    A, b = _lasso_problem()
    lam = 0.02
    p = LBFGSParams(epsilon=1e-6, epsilon_rel=0.0, max_iterations=200)
    x0s = jnp.zeros((4, A.shape[1]))
    res = jax.jit(jax.vmap(lambda x0: minimize_owlqn(
        _loss_factory(A, b), x0, lam, p, fast_phase_epsilon=1e-3)))(x0s)
    assert np.all(np.asarray(res.gnorm) <= 1e-6)
