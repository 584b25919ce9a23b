"""Acceptance tests for the unconstrained L-BFGS solver.

Mirrors the reference example suite (SURVEY.md §4): the README Rosenbrock
anchor, the quadratic free-function example, the float32 example, and
trajectory-exact agreement with the independent NumPy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbfgspp_tpu import (LBFGSParams, Status, minimize,
                         final_approx_hessian, final_approx_inverse_hessian)
from lbfgspp_tpu.utils import objectives


def np_rosen_fg(x):
    fx, g = objectives.rosenbrock_fg(jnp.asarray(x))
    return float(fx), np.asarray(g)


class TestReadmeAnchor:
    """README.md:88-94: Rosenbrock n=10, eps=1e-6, max_iter=100."""

    params = LBFGSParams(epsilon=1e-6, max_iterations=100)

    def test_converges_to_ones(self):
        x0 = jnp.zeros(10)
        res = minimize(objectives.rosenbrock, x0, self.params)
        assert res.status == Status.CONVERGED_GRAD
        np.testing.assert_allclose(np.asarray(res.x), np.ones(10), atol=1e-6)
        assert float(res.fx) < 1e-10
        # 22 under the current reference convergence test; the README's 23
        # predates the epsilon_rel term and is reproduced exactly with
        # epsilon_rel=0 (tests/test_readme_anchor.py).  AD-vs-hand-written
        # gradient rounding may still move the crossing by one.
        assert 21 <= int(res.niter) <= 23

    def test_matches_oracle_exactly(self):
        """The JAX solve must agree with the scalar NumPy oracle (same
        branch structure as the reference) on iteration count and f(x)."""
        x0 = jnp.zeros(10)
        res = minimize(None, x0, self.params,
                       fun_and_grad=objectives.rosenbrock_fg)
        p = oracle.default_params(epsilon=1e-6, max_iterations=100)
        ores = oracle.lbfgs_minimize(np_rosen_fg, np.zeros(10), p,
                                     "nocedalwright")
        assert int(res.niter) == ores["niter"]
        assert int(res.nfev) == ores["nfev"]
        np.testing.assert_allclose(float(res.fx), ores["fx"], rtol=1e-6,
                                   atol=1e-18)
        np.testing.assert_allclose(np.asarray(res.x), ores["x"], atol=1e-10)

    @pytest.mark.parametrize("ls", ["backtracking", "bracketing",
                                    "morethuente", "nocedalwright"])
    def test_all_line_searches_match_oracle(self, ls):
        x0 = jnp.full(10, -0.5)
        res = minimize(None, x0, self.params, line_search=ls,
                       fun_and_grad=objectives.rosenbrock_fg)
        p = oracle.default_params(epsilon=1e-6, max_iterations=100)
        ores = oracle.lbfgs_minimize(np_rosen_fg, np.full(10, -0.5), p, ls)
        assert int(res.niter) == ores["niter"], ls
        assert int(res.nfev) == ores["nfev"], ls
        np.testing.assert_allclose(np.asarray(res.x), ores["x"], atol=1e-8)


class TestQuadratic:
    """examples/example-quadratic.cpp: f(x) = ||x - (0..n-1)||^2."""

    def test_exact_minimum(self):
        n = 10
        res = minimize(objectives.quadratic, jnp.zeros(n), LBFGSParams())
        assert res.status == Status.CONVERGED_GRAD
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.arange(n, dtype=float), atol=1e-4)

    def test_explicit_gradient(self):
        n = 10
        res = minimize(None, jnp.zeros(n), LBFGSParams(),
                       fun_and_grad=objectives.quadratic_fg)
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.arange(n, dtype=float), atol=1e-4)


class TestFloat32:
    """examples/example-rosenbrock.cpp runs the solver in float
    (LBFGSParam<float>); the dtype follows x0."""

    def test_f32_solve(self):
        x0 = jnp.zeros(10, dtype=jnp.float32)
        res = minimize(objectives.rosenbrock, x0,
                       LBFGSParams(epsilon=1e-4, max_iterations=200))
        assert res.x.dtype == jnp.float32
        assert res.status in (Status.CONVERGED_GRAD, Status.CONVERGED_DELTA)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(10), atol=1e-3)


class TestAccessors:
    """final_approx_hessian / final_approx_inverse_hessian (LBFGS.h:192-197).
    """

    def test_hessian_inverse_pair(self):
        res = minimize(objectives.rosenbrock, jnp.zeros(10),
                       LBFGSParams(epsilon=1e-6, max_iterations=100))
        B = np.asarray(final_approx_hessian(res))
        H = np.asarray(final_approx_inverse_hessian(res))
        np.testing.assert_allclose(B @ H, np.eye(10), atol=1e-7)
        # Symmetry
        np.testing.assert_allclose(B, B.T, atol=1e-9)
        np.testing.assert_allclose(H, H.T, atol=1e-9)


class TestTermination:
    def test_early_exit_at_minimum(self):
        """LBFGS.h:100-103: x0 already optimal -> 1 iteration."""
        n = 6
        x0 = jnp.arange(n, dtype=jnp.float64)
        res = minimize(objectives.quadratic, x0, LBFGSParams())
        assert int(res.niter) == 1
        assert res.status == Status.CONVERGED_GRAD

    def test_max_iterations(self):
        res = minimize(objectives.rosenbrock, jnp.zeros(10),
                       LBFGSParams(epsilon=1e-14, epsilon_rel=0.0,
                                   max_iterations=3))
        assert res.status == Status.MAX_ITERATIONS
        assert int(res.niter) == 3

    def test_past_delta_convergence(self):
        res = minimize(objectives.rosenbrock, jnp.zeros(10),
                       LBFGSParams(epsilon=0.0, epsilon_rel=0.0,
                                   past=3, delta=1e-8))
        assert res.status == Status.CONVERGED_DELTA

    def test_jit_wrappable(self):
        params = LBFGSParams(epsilon=1e-6, max_iterations=100)
        f = jax.jit(lambda x0: minimize(objectives.rosenbrock, x0, params))
        res = f(jnp.zeros(10))
        np.testing.assert_allclose(np.asarray(res.x), np.ones(10), atol=1e-5)


class TestMultiStart:
    """examples/example-rosenbrock-bracketing.cpp:40-57: n=2..16, random
    starts, every run must satisfy max|x_i - 1| <= 1e-4.  The reference's
    1024-start sequential loop becomes one vmap'd launch (the batch count is
    reduced here to keep CPU test time sane; bench.py runs the full sweep)."""

    @pytest.mark.parametrize("n", [2, 8, 16])
    def test_random_starts_vmapped(self, n):
        params = LBFGSParams(epsilon=1e-5, max_iterations=200)
        key = jax.random.PRNGKey(n)
        x0s = jax.random.uniform(key, (64, n), jnp.float64, -1.0, 1.0)
        solve = jax.jit(jax.vmap(
            lambda x0: minimize(objectives.rosenbrock, x0, params,
                                line_search="bracketing")))
        res = solve(x0s)
        diff = np.abs(np.asarray(res.x) - 1.0).max()
        assert diff <= 1e-4, diff


def test_rinv_large_m_guardrail():
    """VERDICT r3 weak item: the documented rinv quality cliff (m>=24
    in f32, PERF.md) must be guarded at the API — a UserWarning at
    solver build, not a silent quality drop buried in a perf doc."""
    import warnings as _warnings

    import jax.numpy as jnp
    import pytest as _pytest

    import lbfgspp_tpu as lt

    with _pytest.warns(UserWarning, match="rinv"):
        lt.lbfgs.solver(lambda x: jnp.sum(x * x),
                        lt.LBFGSParams(m=24), direction="rinv")
    # no warning for the measured-safe regime or the sweeps path
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        lt.lbfgs.solver(lambda x: jnp.sum(x * x),
                        lt.LBFGSParams(m=16), direction="rinv")
        lt.lbfgs.solver(lambda x: jnp.sum(x * x),
                        lt.LBFGSParams(m=32), direction="sweeps")


def test_on_ls_fail_restart():
    """``on_ls_fail="restart"``: a line-search failure no longer
    terminates the instance — it restores the better iterate, resets the
    curvature history, and continues from steepest descent; non-failing
    instances are bit-identical to the default path."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    import lbfgspp_tpu as lt
    from lbfgspp_tpu.utils.objectives import rosenbrock

    B, n = 64, 100
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (B, n)), jnp.float32)
    p = lt.LBFGSParams(epsilon=1e-5, max_iterations=162, m=16,
                       max_linesearch=4)
    r = jax.jit(jax.vmap(lambda x: lt.minimize(
        rosenbrock, x, p, direction="rinv")))(x0s)
    st = np.asarray(r.status)
    assert (st >= 10).any()          # the f32 floor produces ls failures
    rr = jax.jit(jax.vmap(lambda x: lt.minimize(
        rosenbrock, x, p, direction="rinv",
        on_ls_fail="restart")))(x0s)
    str_ = np.asarray(rr.status)
    # no instance reports a line-search failure under restart
    assert (str_ < 10).all()
    # instances that never failed are bit-identical
    ok = st < 10
    np.testing.assert_array_equal(np.asarray(rr.x)[ok],
                                  np.asarray(r.x)[ok])
    # failed instances end no worse (monotone acceptance rule)
    fails = ~ok
    assert np.all(np.asarray(rr.fx)[fails] <=
                  np.asarray(r.fx)[fails] + 1e-6)

    with _pytest.raises(ValueError, match="on_ls_fail"):
        lt.lbfgs.solver(lambda x: jnp.sum(x * x), lt.LBFGSParams(),
                        on_ls_fail="retry")
    with _pytest.raises(ValueError, match="max_iterations"):
        lt.lbfgs.solver(lambda x: jnp.sum(x * x),
                        lt.LBFGSParams(max_iterations=0),
                        on_ls_fail="restart")


def test_restart_past_delta_suppressed_on_failed_iterations():
    """ADVICE r4: under on_ls_fail="restart" with past > 0, a permanently
    line-search-failing instance writes its unchanged fx into the ring
    every iteration; without suppression the past/delta test fires and
    reports CONVERGED_DELTA — a success status masking the persistent
    failure.  It must report MAX_ITERATIONS instead."""
    import lbfgspp_tpu as lt

    n = 4

    def flat_fg(x):
        # Constant objective with a nonzero constant gradient: every
        # Armijo test fails strictly (fx_new == fx > fx + c1*a*dg), so
        # the search fails on every iteration, and ||g|| never converges.
        return jnp.asarray(1.0, x.dtype), jnp.ones_like(x)

    p = lt.LBFGSParams(epsilon=1e-8, max_iterations=25, past=3,
                       delta=1e-9, max_linesearch=3)
    res = lt.minimize(fun_and_grad=flat_fg, x0=jnp.zeros(n), params=p,
                      on_ls_fail="restart")
    assert int(res.status) == int(Status.MAX_ITERATIONS), \
        Status(int(res.status))
    # The default stop path is untouched: it reports the failure status.
    res_stop = lt.minimize(fun_and_grad=flat_fg, x0=jnp.zeros(n), params=p)
    assert int(res_stop.status) >= 10, Status(int(res_stop.status))
    # And a genuinely-converging run under restart+past still reports
    # its real convergence path (bit-unchanged when no search fails).
    q = lt.LBFGSParams(epsilon=1e-10, max_iterations=100, past=2,
                       delta=1e-12)
    conv = lt.minimize(objectives.rosenbrock, jnp.zeros(8), q,
                       on_ls_fail="restart")
    conv_ref = lt.minimize(objectives.rosenbrock, jnp.zeros(8), q)
    np.testing.assert_array_equal(np.asarray(conv.x),
                                  np.asarray(conv_ref.x))
    assert int(conv.status) == int(conv_ref.status)


def test_rosenbrock_split_is_permuted_rosenbrock():
    """rosenbrock_split is rosenbrock under the interleave permutation
    (pair i = (x_i, x_{i+n/2})) — same separable problem family, in the
    TPU-friendly [2, n/2] layout (large-n regime; PERF.md round-5)."""
    rng = np.random.default_rng(0)
    n = 64
    x = jnp.asarray(rng.uniform(-2, 2, n))
    # interleave: y[2i] = x[i], y[2i+1] = x[i + n/2]
    y = jnp.stack([x[:n // 2], x[n // 2:]], axis=1).reshape(-1)
    np.testing.assert_allclose(float(objectives.rosenbrock_split(x)),
                               float(objectives.rosenbrock(y)), rtol=1e-14)
    # a solve on the split form converges to all-ones like the original
    res = minimize(objectives.rosenbrock_split, jnp.zeros(20),
                   LBFGSParams(epsilon=1e-6, max_iterations=200))
    assert np.max(np.abs(np.asarray(res.x) - 1.0)) <= 1e-5
