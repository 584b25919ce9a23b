"""Native CPU solver core (lbfgspp_tpu/native) parity tests.

The C++ core must match the NumPy trajectory oracle (and hence the JAX
solver) iteration-for-iteration in f64 across all four line searches.
"""

import numpy as np
import pytest

from lbfgspp_tpu import LBFGSParams, native
import oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build: {native.build_error()}")


def np_rosenbrock(x):
    xe, xo = x[0::2], x[1::2]
    t1, t2 = 1.0 - xe, 10.0 * (xo - xe * xe)
    g = np.zeros_like(x)
    g[1::2] = 20.0 * t2
    g[0::2] = -2.0 * (xe * g[1::2] + t1)
    return float(np.sum(t1 * t1 + t2 * t2)), g


@pytest.mark.parametrize("ls", ["backtracking", "bracketing",
                                "nocedalwright", "morethuente"])
@pytest.mark.parametrize("n", [2, 10])
def test_matches_oracle_exactly_short_horizon(ls, n):
    """Iteration-exact parity over a 25-iteration window.

    Long chaotic Rosenbrock runs amplify the summation-order difference
    between the C++ loops and numpy's BLAS dots, so exactness is asserted
    on a bounded horizon and full runs are checked for convergence below.
    """
    params = LBFGSParams(epsilon=1e-6, max_iterations=25,
                         max_linesearch=60)
    pdict = oracle.default_params(epsilon=1e-6, max_iterations=25,
                                  max_linesearch=60)
    rng = np.random.default_rng(n)
    for trial in range(5):
        x0 = rng.uniform(-1, 1, n)
        res = native.minimize("rosenbrock", x0, params, line_search=ls)
        out = oracle.lbfgs_minimize(np_rosenbrock, x0, pdict, ls)
        assert res.niter == out["niter"], (ls, n, trial)
        assert res.nfev == out["nfev"], (ls, n, trial)
        np.testing.assert_allclose(res.x, out["x"], rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("ls", ["backtracking", "bracketing",
                                "nocedalwright", "morethuente"])
def test_full_runs_converge(ls):
    """Full-horizon runs hit the reference multistart tolerance."""
    params = LBFGSParams(epsilon=1e-6, max_iterations=400,
                         max_linesearch=256)
    rng = np.random.default_rng(7)
    for trial in range(20):
        x0 = rng.uniform(-1, 1, 10)
        res = native.minimize("rosenbrock", x0, params, line_search=ls)
        assert np.max(np.abs(res.x - 1.0)) <= 1e-4, (ls, trial, res.status)


def test_callback_objective_matches_builtin():
    params = LBFGSParams(epsilon=1e-6, max_iterations=100)
    x0 = np.zeros(10)
    r1 = native.minimize("rosenbrock", x0, params)
    r2 = native.minimize(np_rosenbrock, x0, params)
    assert r1.niter == r2.niter == 22
    np.testing.assert_allclose(r1.x, r2.x, rtol=1e-12)


def test_matches_jax_solver_exactly():
    import jax.numpy as jnp
    from lbfgspp_tpu import minimize
    from lbfgspp_tpu.utils.objectives import rosenbrock_fg

    params = LBFGSParams(epsilon=1e-6, max_iterations=100)
    res_j = minimize(fun_and_grad=rosenbrock_fg, x0=jnp.zeros(10),
                     params=params)
    res_n = native.minimize("rosenbrock", np.zeros(10), params)
    assert res_n.niter == int(res_j.niter)
    assert res_n.status == int(res_j.status)
    np.testing.assert_allclose(res_n.x, np.asarray(res_j.x), rtol=1e-12)
    np.testing.assert_allclose(res_n.fx, float(res_j.fx), rtol=1e-10,
                               atol=1e-18)


def test_quadratic_builtin():
    params = LBFGSParams(epsilon=1e-8)
    res = native.minimize("quadratic", np.zeros(12), params)
    np.testing.assert_allclose(res.x, np.arange(12.0), atol=1e-6)
    assert res.status in (1, 2)


def test_status_codes():
    # An always-NaN objective drives backtracking to its failure statuses
    # (max_linesearch / step_too_small), surfaced as codes, not crashes.
    def bad(x):
        return float("nan"), np.ones_like(x)

    res = native.minimize(bad, np.ones(4),
                          LBFGSParams(max_iterations=50),
                          line_search="backtracking")
    assert res.status in (12, 13)


def test_does_not_mutate_x0():
    x0 = np.zeros(10)
    native.minimize("rosenbrock", x0, LBFGSParams(max_iterations=50))
    np.testing.assert_array_equal(x0, np.zeros(10))


def np_chained_fg(x):
    fx = (x[0] - 1) ** 2 + np.sum(4 * (x[1:] - x[:-1] ** 2) ** 2)
    g = np.zeros_like(x)
    g[0] = 2 * (x[0] - 1) + 16 * (x[0] ** 2 - x[1]) * x[0]
    g[1:] = 8 * (x[1:] - x[:-1] ** 2)
    g[1:-1] += 16 * (x[1:-1] ** 2 - x[2:]) * x[1:-1]
    return float(fx), g


def test_lbfgsb_box_example_matches_oracle():
    """Reference box example (example-rosenbrock-box.cpp setup): exact
    iteration parity with the index-set oracle and the JAX solver."""
    import oracle_b
    from lbfgspp_tpu import LBFGSBParams

    n = 25
    lb = np.full(n, 2.0)
    ub = np.full(n, 4.0)
    lb[2], ub[2] = -np.inf, np.inf
    x0 = np.full(n, 3.0)
    x0[0] = x0[1] = 2.0
    x0[5] = x0[7] = 4.0

    res = native.minimize_b(np_chained_fg, x0, lb, ub)
    xo, fo, go, pgo, ko = oracle_b.lbfgsb_minimize(
        np_chained_fg, x0, oracle_b.default_b_params(), lb, ub)
    assert res.niter == ko
    np.testing.assert_allclose(res.x, xo, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(res.fx, fo, rtol=1e-11)


@pytest.mark.parametrize("seed", range(4))
def test_lbfgsb_random_matches_oracle(seed):
    """Random coupled quadratics with random bounds: trajectory parity."""
    import oracle_b

    rng = np.random.default_rng(300 + seed)
    n = 9
    a_half = rng.standard_normal((n, n)) / np.sqrt(n)
    a = a_half @ a_half.T + 0.5 * np.eye(n)
    b = rng.standard_normal(n)
    lb = rng.standard_normal(n) - 1.5
    ub = lb + 1.0 + rng.random(n)
    x0 = np.clip(rng.standard_normal(n), lb, ub)

    def fg(x):
        ax = a @ x
        return float(0.5 * x @ ax + b @ x), ax + b

    res = native.minimize_b(fg, x0, lb, ub)
    xo, fo, go, pgo, ko = oracle_b.lbfgsb_minimize(
        fg, x0, oracle_b.default_b_params(), lb, ub)
    assert res.niter == ko, seed
    np.testing.assert_allclose(res.x, xo, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(res.fx, fo, rtol=1e-10, atol=1e-12)


def test_lbfgsb_pinned_and_infinite():
    n = 8
    lb = np.full(n, -5.0)
    ub = np.full(n, 5.0)
    lb[3] = ub[3] = 2.5
    lb[6], ub[6] = -np.inf, np.inf
    d = np.arange(n, dtype=float)

    def fg(x):
        r = x - d
        return float(r @ r), 2.0 * r

    from lbfgspp_tpu import LBFGSBParams
    res = native.minimize_b(fg, np.zeros(n), lb, ub,
                            LBFGSBParams(epsilon=1e-8, epsilon_rel=0.0))
    want = np.clip(d, lb, ub)
    np.testing.assert_allclose(res.x, want, atol=1e-5)
    assert res.x[3] == 2.5


def test_fastcall_matches_ctypes_path():
    """The CPython C-extension fast path and the ctypes path are two
    bindings of the same C core and must return identical results."""
    native = pytest.importorskip("lbfgspp_tpu.native")
    if not native.available():
        pytest.skip(native.build_error())
    if native._load_fast() is None:
        pytest.skip("C extension unavailable")
    p = LBFGSParams(epsilon=1e-6, max_iterations=100)
    x0 = np.zeros(10)
    fast = native.minimize("rosenbrock", x0, p)
    saved = native._fast
    native._fast = None            # force the ctypes branch
    try:
        slow = native.minimize("rosenbrock", x0, p)
    finally:
        native._fast = saved
    assert fast.niter == slow.niter and fast.status == slow.status
    assert fast.fx == slow.fx and fast.gnorm == slow.gnorm
    np.testing.assert_array_equal(fast.x, slow.x)

    lb = np.full(10, 2.0)
    ub = np.full(10, 4.0)
    fastb = native.minimize_b("rosenbrock", np.full(10, 3.0), lb, ub)
    native._fast = None
    try:
        slowb = native.minimize_b("rosenbrock", np.full(10, 3.0), lb, ub)
    finally:
        native._fast = saved
    assert fastb.niter == slowb.niter and fastb.fx == slowb.fx
    np.testing.assert_array_equal(fastb.x, slowb.x)


def test_minimize_batch_matches_singles():
    """The threaded CPU batch is the same core fanned over threads —
    every instance must be bit-identical to its single-solve result,
    independent of the thread count."""
    native = pytest.importorskip("lbfgspp_tpu.native")
    if not native.available() or native._load_fast() is None:
        pytest.skip("native C extension unavailable")
    rng = np.random.default_rng(5)
    x0s = rng.uniform(-2.0, 2.0, (32, 10))
    p = LBFGSParams(epsilon=1e-6, max_iterations=200)
    rb = native.minimize_batch("rosenbrock", x0s, p)
    rb1 = native.minimize_batch("rosenbrock", x0s, p, threads=1)
    np.testing.assert_array_equal(rb.x, rb1.x)
    np.testing.assert_array_equal(rb.niter, rb1.niter)
    for i in range(8):
        s = native.minimize("rosenbrock", x0s[i], p)
        assert s.niter == rb.niter[i] and s.fx == rb.fx[i]
        assert s.status == rb.status[i] and s.nfev == rb.nfev[i]
        np.testing.assert_array_equal(s.x, rb.x[i])
    with pytest.raises(TypeError):
        native.minimize_batch(lambda x: (0.0, x), x0s, p)
