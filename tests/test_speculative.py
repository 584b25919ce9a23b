"""Speculative K-ladder line search (TPU batched-throughput feature).

No reference counterpart — these tests pin its own contract: every
accepted step satisfies the Armijo condition at minimum, the selection
prefers (strong) Wolfe candidates, full solves converge, and the search
honors step_max (the L-BFGS-B contract, LBFGSB.h:200-203)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbfgspp_tpu import LBFGSParams, LBFGSBParams, lbfgs, lbfgsb
from lbfgspp_tpu.linesearch import LINE_SEARCHES, make_speculative
from lbfgspp_tpu.types import Status
from lbfgspp_tpu.utils import objectives


def random_case(seed, n=8):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    xp = jax.random.uniform(k1, (n,), jnp.float64, -1.5, 1.5)
    fx, grad = objectives.rosenbrock_fg(xp)
    noise = jax.random.normal(k2, (n,), jnp.float64)
    drt = -grad + 0.3 * jnp.linalg.norm(grad) * noise / jnp.linalg.norm(noise)
    dg = jnp.dot(grad, drt)
    if float(dg) >= 0:
        drt = -grad
        dg = jnp.dot(grad, drt)
    return xp, drt, fx, grad, dg


@pytest.mark.parametrize("k", [2, 4, 8])
@pytest.mark.parametrize("seed", range(8))
def test_accepted_step_satisfies_armijo(k, seed):
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(seed)
    search = make_speculative(k=k)
    res = search(objectives.rosenbrock_fg, params, xp, drt,
                 params.max_step, 1.0, fx, grad, dg)
    assert int(res.status) == Status.RUNNING
    # Armijo at the accepted point (ftol, LineSearchBacktracking.h:85).
    assert float(res.fx) <= float(fx) + params.ftol * float(res.step) * \
        float(dg) + 1e-12
    # nfev counts K evaluations per round.
    assert int(res.nfev) % k == 0 and int(res.nfev) >= k
    # The returned point is xp + step*drt exactly.
    np.testing.assert_allclose(np.asarray(res.x),
                               np.asarray(xp + res.step * drt), rtol=1e-15)


@pytest.mark.parametrize("seed", range(8))
def test_prefers_wolfe_candidates(seed):
    """When a strong-Wolfe candidate exists in the ladder, the accepted
    point must satisfy the regular Wolfe curvature condition (keeps s'y
    healthy for the curvature gate, LBFGS.h:161)."""
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(seed)
    search = make_speculative(k=8)
    res = search(objectives.rosenbrock_fg, params, xp, drt,
                 params.max_step, 1.0, fx, grad, dg)
    assert int(res.status) == Status.RUNNING
    # The ladder on Rosenbrock from these starts always contains a
    # curvature-satisfying candidate; selection must find one.
    assert float(res.dg) >= params.wolfe * float(dg) - 1e-12


def test_honors_step_max():
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(2)
    step_max = 0.01
    res = LINE_SEARCHES["speculative"](
        objectives.rosenbrock_fg, params, xp, drt, step_max,
        min(1.0, step_max), fx, grad, dg)
    assert int(res.status) == Status.RUNNING
    assert float(res.step) <= step_max + 1e-15


def test_solver_converges_unconstrained():
    params = LBFGSParams(epsilon=1e-6, max_iterations=300)
    x0 = jnp.full((10,), -1.5, jnp.float64)
    res = lbfgs.minimize(objectives.rosenbrock, x0, params,
                         line_search="speculative")
    assert int(res.status) == Status.CONVERGED_GRAD
    assert float(jnp.max(jnp.abs(res.x - 1.0))) < 1e-5


def test_solver_converges_box():
    """Box solve (step_max capping active every iteration)."""
    params = LBFGSBParams(epsilon=1e-6, max_iterations=100)
    n = 10
    lb = jnp.full((n,), 2.0, jnp.float64)
    ub = jnp.full((n,), 4.0, jnp.float64)
    x0 = jnp.full((n,), 3.0, jnp.float64)
    res = lbfgsb.minimize(objectives.rosenbrock, x0, lb, ub, params,
                          line_search="speculative")
    assert int(res.status) in (Status.CONVERGED_GRAD, Status.CONVERGED_DELTA)
    assert float(res.fx) <= 5.0 + 1e-6     # pairwise optimum pins (2, 4)
    x = np.asarray(res.x)
    assert np.all(x >= 2.0 - 1e-12) and np.all(x <= 4.0 + 1e-12)


def test_vmap_batch_quality():
    """Batched solves converge per instance.  (Bit-exact vmap-vs-single
    trajectories are NOT part of this search's contract: its greedy
    large-step candidates visit chaotic Rosenbrock regions where batching-
    dependent reduction tiling flips candidate acceptance — unlike the
    parity searches, whose solver-level iteration counts are vmap-stable.)
    """
    params = LBFGSParams(epsilon=1e-6, max_iterations=400)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (16, 12)), jnp.float64)
    batched = jax.jit(jax.vmap(lambda x: lbfgs.minimize(
        objectives.rosenbrock, x, params, line_search="speculative")))(x0s)
    assert np.all(np.asarray(batched.status) == Status.CONVERGED_GRAD)
    # Reference multistart criterion (example-rosenbrock-bracketing.cpp:50-54)
    assert np.all(np.max(np.abs(np.asarray(batched.x) - 1.0), axis=1) <= 1e-4)


def test_failure_statuses():
    params = LBFGSParams()
    xp, drt, fx, grad, dg = random_case(0)
    # step0 <= 0
    res = LINE_SEARCHES["speculative"](
        objectives.rosenbrock_fg, params, xp, drt, params.max_step, 0.0,
        fx, grad, dg)
    assert int(res.status) == Status.LS_INVALID_STEP
    # ascent direction
    res = LINE_SEARCHES["speculative"](
        objectives.rosenbrock_fg, params, xp, grad, params.max_step, 1.0,
        fx, grad, jnp.dot(grad, grad))
    assert int(res.status) == Status.LS_NOT_DESCENT
    # exhaustion: a ladder that can never satisfy Armijo (NaN objective)
    nan_fg = lambda x: (jnp.asarray(jnp.nan, x.dtype), x)
    res = LINE_SEARCHES["speculative"](
        nan_fg, params, xp, drt, params.max_step, 1.0, fx, grad, dg)
    assert int(res.status) in (Status.LS_MAX_LINESEARCH,
                               Status.LS_STEP_TOO_SMALL)


def test_sharded_matches_single_device():
    """Feature-sharded solve with the speculative search: the K-candidate
    reductions become collectives; trajectory must match single device."""
    from lbfgspp_tpu.parallel.sharded import minimize_sharded, sharding_for
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices("cpu")[:4])
    mesh = Mesh(devices, ("feat",))
    n = 16
    x0 = jnp.asarray(np.linspace(-1.5, 0.5, n), jnp.float64)
    params = LBFGSParams(epsilon=1e-6, max_iterations=200)

    ref = lbfgs.minimize(objectives.rosenbrock, x0, params,
                         line_search="speculative")

    def local_fg(x_local):
        # Chained quadratic-free form is not separable; use a separable
        # objective for the sharded check: sum (x_i - i/n)^4 + x_i^2.
        t = jax.lax.axis_index("feat") * (n // 4) + jnp.arange(n // 4)
        target = t.astype(x_local.dtype) / n
        fx = jnp.sum((x_local - target) ** 4 + x_local ** 2)
        g = 4 * (x_local - target) ** 3 + 2 * x_local
        return jax.lax.psum(fx, "feat"), g

    sh = minimize_sharded(local_fun_and_grad=local_fg, x0=x0, params=params,
                          mesh=mesh, line_search="speculative")

    # Single-device equivalent of the same separable objective
    target_full = jnp.arange(n, dtype=jnp.float64) / n
    full = lambda x: jnp.sum((x - target_full) ** 4 + x ** 2)
    ref2 = lbfgs.minimize(full, x0, params, line_search="speculative")
    assert int(sh.niter) == int(ref2.niter)
    np.testing.assert_allclose(np.asarray(sh.x), np.asarray(ref2.x),
                               rtol=1e-12, atol=1e-14)
    del ref
