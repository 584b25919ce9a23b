"""scipy_compat: the scipy.optimize.minimize-style front end."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbfgspp_tpu.scipy_compat import fmin_l_bfgs_b, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock, rosenbrock_fg


def test_unconstrained_autodiff():
    out = minimize(rosenbrock, jnp.full((10,), -1.2),
                   options={"gtol": 1e-6, "maxiter": 200})
    assert out.success
    assert out.status == 1
    np.testing.assert_allclose(np.asarray(out.x), 1.0, atol=1e-5)
    assert out.nfev >= out.nit
    assert out.jac.shape == (10,)


def test_jac_true_matches_autodiff():
    x0 = jnp.full((8,), -0.5)
    a = minimize(rosenbrock, x0, options={"gtol": 1e-8})
    b = minimize(rosenbrock_fg, x0, jac=True, options={"gtol": 1e-8})
    assert a.nit == b.nit
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


def test_separate_jac_callable():
    def f(x):
        return float(0.0) + jnp.sum((x - 3.0) ** 2)

    def g(x):
        return 2.0 * (x - 3.0)

    out = minimize(f, jnp.zeros(5), jac=g, options={"gtol": 1e-10})
    np.testing.assert_allclose(np.asarray(out.x), 3.0, atol=1e-8)


def test_bounds_select_lbfgsb():
    # quadratic with minimum outside the box -> clipped solution
    d = jnp.asarray(np.linspace(-3.0, 3.0, 6))
    out = minimize(lambda x: jnp.sum((x - d) ** 2), jnp.zeros(6),
                   bounds=[(-1.0, 1.0)] * 6)
    np.testing.assert_allclose(np.asarray(out.x),
                               np.clip(np.asarray(d), -1, 1), atol=1e-6)
    assert out.success


def test_bounds_none_entries_and_scipy_bounds_object():
    d = jnp.asarray([-2.0, 2.0, 0.5])
    fun = lambda x: jnp.sum((x - d) ** 2)
    out = minimize(fun, jnp.zeros(3),
                   bounds=[(None, 1.0), (None, 1.0), (None, None)])
    np.testing.assert_allclose(np.asarray(out.x), [-2.0, 1.0, 0.5],
                               atol=1e-6)
    scipy = pytest.importorskip("scipy")
    from scipy.optimize import Bounds
    out2 = minimize(fun, jnp.zeros(3),
                    bounds=Bounds([-np.inf] * 3, [1.0, 1.0, np.inf]))
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(out2.x))


def test_matches_scipy_result():
    scipy = pytest.importorskip("scipy")
    from scipy.optimize import minimize as sp_min
    rng = np.random.default_rng(3)
    q = rng.standard_normal((6, 6))
    a = q.T @ q + 6 * np.eye(6)
    b = rng.standard_normal(6)
    fun = lambda x: 0.5 * x @ a @ x + b @ x
    ours = minimize(lambda x: 0.5 * x @ jnp.asarray(a) @ x
                    + jnp.asarray(b) @ x,
                    jnp.zeros(6), options={"gtol": 1e-10})
    ref = sp_min(lambda x: (fun(x), a @ x + b), np.zeros(6), jac=True,
                 method="L-BFGS-B", options={"gtol": 1e-12, "ftol": 0})
    assert ours.fun <= ref.fun + 1e-10


def test_maxiter_reported_as_failure():
    out = minimize(rosenbrock, jnp.full((16,), -1.2),
                   options={"maxiter": 3, "gtol": 1e-12})
    assert not out.success
    assert out.nit == 3
    assert "maximum" in out.message


def test_args_and_tol_and_option_mapping():
    def f(x, shift):
        return jnp.sum((x - shift) ** 2)

    out = minimize(f, jnp.zeros(4), args=(2.5,), tol=1e-9,
                   options={"maxcor": 3, "maxls": 30, "ftol": 1e-14})
    np.testing.assert_allclose(np.asarray(out.x), 2.5, atol=1e-7)
    assert out.solver_result.history.s.shape[0] == 3  # maxcor -> m


def test_unknown_option_raises():
    with pytest.raises(ValueError, match="unknown options"):
        minimize(rosenbrock, jnp.zeros(4), options={"bogus": 1})
    with pytest.raises(ValueError, match="unsupported method"):
        minimize(rosenbrock, jnp.zeros(4), method="CG")


def test_explicit_lbfgs_with_bounds_raises():
    with pytest.raises(ValueError, match="cannot handle bounds"):
        minimize(rosenbrock, jnp.zeros(4), method="L-BFGS",
                 bounds=[(0.0, 1.0)] * 4)


def test_standard_scipy_options_tolerated():
    out = minimize(rosenbrock, jnp.full(4, -0.5),
                   options={"disp": True, "iprint": 1, "maxfun": 15000,
                            "eps": 1e-8, "gtol": 1e-6})
    assert out.success


def test_fmin_l_bfgs_b_triple_and_conventions():
    # fprime=None + approx_grad=False: func returns (fx, grad)
    x, f, info = fmin_l_bfgs_b(rosenbrock_fg, jnp.full((10,), -1.2),
                               pgtol=1e-8)
    assert f < 1e-10
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-6)
    assert info["warnflag"] == 0
    assert info["task"].startswith("CONVERGENCE")
    assert info["funcalls"] >= info["nit"] > 0
    assert info["grad"].shape == (10,)

    # approx_grad=True: plain objective, autodiff gradient
    x2, f2, info2 = fmin_l_bfgs_b(rosenbrock, jnp.full((10,), -1.2),
                                  approx_grad=True, pgtol=1e-8)
    assert info2["nit"] == info["nit"]
    # hand-written vs autodiff gradient: same trajectory up to last-ulp
    # gradient rounding differences
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2),
                               rtol=0, atol=1e-12)

    # separate fprime callable — same gradient function as approx_grad's
    # autodiff, so bit-identical to x2
    import jax
    x3, _, _ = fmin_l_bfgs_b(rosenbrock, jnp.full((10,), -1.2),
                             fprime=jax.grad(rosenbrock), pgtol=1e-8)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x3))


def test_fmin_l_bfgs_b_bounds_and_warnflag():
    d = jnp.asarray(np.linspace(-3.0, 3.0, 6))
    fun = lambda x: jnp.sum((x - d) ** 2)
    x, f, info = fmin_l_bfgs_b(fun, jnp.zeros(6), approx_grad=True,
                               bounds=[(-1.0, 1.0)] * 6)
    np.testing.assert_allclose(np.asarray(x),
                               np.clip(np.asarray(d), -1, 1), atol=1e-6)
    # iteration cap -> warnflag 1 with scipy's task string
    _, _, cap = fmin_l_bfgs_b(rosenbrock_fg, jnp.full((16,), -1.2),
                              maxiter=2, pgtol=1e-12)
    assert cap["warnflag"] == 1
    assert cap["task"].startswith("STOP")
    assert cap["nit"] == 2


def test_fmin_l_bfgs_b_callback_visits_iterates():
    seen = []
    x, f, info = fmin_l_bfgs_b(rosenbrock_fg, jnp.full((6,), -0.5),
                               pgtol=1e-8, callback=seen.append)
    assert len(seen) == info["nit"]
    np.testing.assert_array_equal(seen[-1], np.asarray(x))
    # callback path must agree with the fused-run path exactly
    x2, _, info2 = fmin_l_bfgs_b(rosenbrock_fg, jnp.full((6,), -0.5),
                                 pgtol=1e-8)
    assert info2["nit"] == info["nit"]
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_fmin_l_bfgs_b_matches_scipy():
    pytest.importorskip("scipy")
    from scipy.optimize import fmin_l_bfgs_b as sp_fmin
    rng = np.random.default_rng(7)
    q = rng.standard_normal((8, 8))
    a = q.T @ q + 8 * np.eye(8)
    b = rng.standard_normal(8)
    bounds = [(-0.2, 0.2)] * 8

    def np_fg(x):
        return 0.5 * x @ a @ x + b @ x, a @ x + b

    def jx_fg(x):
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        return 0.5 * x @ aj @ x + bj @ x, aj @ x + bj

    xs, fs, _ = sp_fmin(np_fg, np.zeros(8), bounds=bounds, pgtol=1e-10,
                        factr=10.0)
    xo, fo, info = fmin_l_bfgs_b(jx_fg, jnp.zeros(8), bounds=bounds,
                                 pgtol=1e-10, factr=10.0)
    assert info["warnflag"] == 0
    np.testing.assert_allclose(np.asarray(xo), xs, atol=1e-7)
    assert fo <= fs + 1e-12


def test_gtol_not_weakened_by_relative_test():
    """scipy has no relative-gradient test; a tight gtol must stay in
    force even when ||x|| is large (epsilon_rel is disabled unless the
    eps_rel extension option asks for it)."""
    shift = 999.0
    fun = lambda x: rosenbrock(x - shift)   # optimum at x = 1000
    x0 = jnp.full((10,), shift - 2.2)
    tight = minimize(fun, x0, options={"gtol": 1e-8, "maxiter": 500})
    assert tight.success
    np.testing.assert_allclose(np.asarray(tight.x), shift + 1.0, atol=1e-6)
    # opting back into the solver's relative test stops far earlier
    loose = minimize(fun, x0, options={"gtol": 1e-8, "eps_rel": 1e-5,
                                       "maxiter": 500})
    assert loose.nit < tight.nit


def test_bounds_length_mismatch_raises():
    fun = lambda x: jnp.sum(x ** 2)
    with pytest.raises(ValueError, match="length"):
        minimize(fun, jnp.zeros(5), bounds=[(0.0, 1.0)] * 3)
    with pytest.raises(ValueError, match="length"):
        fmin_l_bfgs_b(fun, jnp.zeros(5), approx_grad=True,
                      bounds=[(0.0, 1.0)] * 7)


def test_task_warnflag_mapping():
    """Line-search breakdown must surface as scipy's warnflag=2 /
    ABNORMAL_TERMINATION_IN_LNSRCH, not as an iteration-limit stop."""
    from lbfgspp_tpu.scipy_compat import _task_warnflag
    from lbfgspp_tpu.types import Status

    assert _task_warnflag(int(Status.CONVERGED_GRAD))[1] == 0
    assert _task_warnflag(int(Status.CONVERGED_DELTA))[1] == 0
    assert _task_warnflag(int(Status.MAX_ITERATIONS)) == (
        "STOP: TOTAL NO. of ITERATIONS REACHED LIMIT", 1)
    for s in (Status.LS_INVALID_STEP, Status.LS_NOT_DESCENT,
              Status.LS_MAX_LINESEARCH, Status.LS_STEP_TOO_SMALL,
              Status.LS_STEP_TOO_LARGE, Status.LS_BRACKET_INVERTED,
              Status.LS_NUMERICAL):
        assert _task_warnflag(int(s)) == ("ABNORMAL_TERMINATION_IN_LNSRCH", 2)


def test_fmin_pgtol_absolute():
    """fmin_l_bfgs_b honors pgtol absolutely (epsilon_rel disabled)."""
    shift = 999.0
    def fg(x):
        f, g = rosenbrock_fg(x - shift)
        return f, g
    x, f, info = fmin_l_bfgs_b(fg, jnp.full((10,), shift - 2.2),
                               pgtol=1e-8, factr=0.0, maxiter=500)
    assert info["warnflag"] == 0
    np.testing.assert_allclose(np.asarray(x), shift + 1.0, atol=1e-6)
