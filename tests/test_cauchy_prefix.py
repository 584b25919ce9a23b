"""Prefix-sum GCP (batch fast path) vs the sequential scan walk.

`cauchy_point_prefix` re-expresses the reference's sorted interval walk
(Cauchy.h:183-256) as triangular-masked matmuls + cumulative sums.  The
math is identical up to reassociation, so in f64 the two implementations
must produce the same index sets and the same Cauchy point to tight
tolerance on randomized problems covering every structural case: ties,
pinned variables (lb == ub), infinite bounds, boundary starts, and empty
participation sets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbfgspp_tpu.ops import bmat, cauchy
from lbfgspp_tpu import LBFGSBParams
from lbfgspp_tpu.batch import minimize_b_batched
from lbfgspp_tpu.utils.objectives import rosenbrock_chained_fg


def _random_bhistory(rng, n, m, ncorr):
    bh = bmat.init_b_history(n, m, jnp.float64)
    for _ in range(ncorr):
        s = jnp.asarray(rng.standard_normal(n))
        y = s * rng.uniform(0.5, 2.0) + 0.1 * jnp.asarray(
            rng.standard_normal(n))
        bh = bmat.add_correction_b(bh, s, y, jnp.asarray(True))
    return bh


CASES = list(range(24))


@pytest.mark.parametrize("seed", CASES)
def test_prefix_matches_scan(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 24))
    m = 6
    ncorr = int(rng.integers(0, 2 * m))
    bh = _random_bhistory(rng, n, m, ncorr)

    lb = rng.uniform(-2.0, 0.0, n)
    ub = rng.uniform(0.5, 2.5, n)
    # structural cases: pinned variables, infinite bounds, ties
    if seed % 3 == 0:
        k = rng.integers(0, n)
        lb[k] = ub[k] = rng.uniform(-1, 1)
    if seed % 4 == 0:
        lb[rng.integers(0, n)] = -np.inf
        ub[rng.integers(0, n)] = np.inf
    x0 = np.clip(rng.uniform(-2.0, 2.5, n), lb, ub)
    if seed % 5 == 0:
        x0[rng.integers(0, n)] = lb[rng.integers(0, n) % n]
    g = rng.standard_normal(n)
    if seed % 6 == 0:
        g[rng.integers(0, n)] = 0.0           # brk = inf (free coordinate)

    # force exact breakpoint ties for a couple of coordinates
    if seed % 2 == 0 and n >= 4:
        # brk = (x0 - lb)/g for g > 0; pick two coords with equal ratio
        g[0] = abs(g[0]) + 0.5
        g[1] = g[0]
        lb[0] = x0[0] - 0.7 * g[0]
        lb[1] = x0[1] - 0.7 * g[1]

    args = (bh, jnp.asarray(x0), jnp.asarray(g), jnp.asarray(lb),
            jnp.asarray(ub))
    r_scan = cauchy.cauchy_point(*args)
    r_pref = cauchy.cauchy_point_prefix(*args)

    np.testing.assert_array_equal(np.asarray(r_scan.newact_mask),
                                  np.asarray(r_pref.newact_mask))
    np.testing.assert_array_equal(np.asarray(r_scan.free_mask),
                                  np.asarray(r_pref.free_mask))
    np.testing.assert_allclose(np.asarray(r_pref.xcp),
                               np.asarray(r_scan.xcp),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_pref.vecc),
                               np.asarray(r_scan.vecc),
                               rtol=1e-9, atol=1e-11)

    # The argsort+gather permutation (large-n path) must reproduce the
    # one-hot permutation bit-for-bit: same stable ranks, same rows.
    r_sort = cauchy.cauchy_point_prefix_sorted(*args)
    for f in cauchy.CauchyResult._fields:
        np.testing.assert_array_equal(np.asarray(getattr(r_pref, f)),
                                      np.asarray(getattr(r_sort, f)), f)


def test_fast_path_box_solutions_match_reference_path():
    """End-to-end: the batched fast path (prefix GCP + unrolled BOXCQP)
    solves the reference box example sweep to the same solutions as the
    bit-exact path."""
    rng = np.random.default_rng(0)
    B, n = 8, 25
    lb = np.full(n, 2.0)
    ub = np.full(n, 4.0)
    lb[2], ub[2] = -np.inf, np.inf
    x0s = jnp.asarray(rng.uniform(2.0, 4.0, (B, n)))

    ref = minimize_b_batched(fun_and_grad=rosenbrock_chained_fg, x0s=x0s,
                             lb=lb, ub=ub, gcp="scan",
                             unroll_subspace=False)
    fast = minimize_b_batched(fun_and_grad=rosenbrock_chained_fg, x0s=x0s,
                              lb=lb, ub=ub, unroll_subspace=True)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(ref.x),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fast.fx), np.asarray(ref.fx),
                               rtol=1e-9)
    # identical trajectories in f64 on this sweep
    np.testing.assert_array_equal(np.asarray(fast.niter),
                                  np.asarray(ref.niter))


def test_prefix_sorted_solver_matches_scan_solver():
    """End-to-end single-instance: gcp="prefix_sorted" (the large-n path)
    reproduces the bit-exact scan path's trajectory on the reference box
    example (example-rosenbrock-box.cpp:36-64 shape)."""
    from lbfgspp_tpu import LBFGSBParams, minimize_b

    n = 25
    lb = np.full(n, 2.0)
    ub = np.full(n, 4.0)
    lb[2], ub[2] = -np.inf, np.inf
    x0 = jnp.asarray(np.clip(np.linspace(1.5, 4.5, n), lb, ub))
    params = LBFGSBParams(epsilon=1e-6, max_iterations=100)

    ref = minimize_b(fun_and_grad=rosenbrock_chained_fg, x0=x0,
                     lb=jnp.asarray(lb), ub=jnp.asarray(ub), params=params,
                     gcp="scan")
    fast = minimize_b(fun_and_grad=rosenbrock_chained_fg, x0=x0,
                      lb=jnp.asarray(lb), ub=jnp.asarray(ub), params=params,
                      gcp="prefix_sorted")
    assert int(fast.niter) == int(ref.niter)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(fast.fx), float(ref.fx), rtol=1e-11)
