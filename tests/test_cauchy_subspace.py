"""Tests for the generalized Cauchy point (ops/cauchy.py) and the BOXCQP
subspace minimization (ops/subspace.py) against the NumPy index-set oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lbfgspp_tpu.ops import bmat, cauchy, subspace
from oracle_b import OracleBHistory, cauchy_point, subspace_minimize
from test_bmat import make_histories, slot_to_compact


def random_box_setup(n, rng, pin_frac=0.0, inf_frac=0.2):
    """Random x0 inside random bounds, with some infinite bounds and
    optionally pinned variables."""
    lb = rng.standard_normal(n) - 2.0
    ub = lb + 1.0 + 2.0 * rng.random(n)
    which = rng.random(n)
    lb = np.where(which < inf_frac / 2, -np.inf, lb)
    ub = np.where(which > 1 - inf_frac / 2, np.inf, ub)
    if pin_frac > 0:
        pin = rng.random(n) < pin_frac
        mid = np.where(np.isfinite(lb), lb + 0.5, 0.0)
        lb = np.where(pin, mid, lb)
        ub = np.where(pin, mid, ub)
    x0 = np.clip(rng.standard_normal(n), lb, ub)
    g = rng.standard_normal(n)
    return x0, g, lb, ub


@pytest.mark.parametrize("ncorr", [0, 2, 6, 9])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_cauchy_matches_oracle(ncorr, seed):
    n, m = 15, 6
    bh, ob, rng = make_histories(n, m, ncorr, seed=100 * seed + ncorr)
    x0, g, lb, ub = random_box_setup(n, rng, pin_frac=0.1)

    res = cauchy.cauchy_point(bh, jnp.asarray(x0), jnp.asarray(g),
                              jnp.asarray(lb), jnp.asarray(ub))
    xcp_o, vecc_o, newact_o, fv_o = cauchy_point(ob, x0, g, lb, ub)

    np.testing.assert_allclose(np.asarray(res.xcp), xcp_o,
                               rtol=1e-10, atol=1e-12)
    got_c = slot_to_compact(np.asarray(res.vecc), m, ncorr)
    np.testing.assert_allclose(got_c, vecc_o, rtol=1e-9, atol=1e-10)
    assert set(np.where(np.asarray(res.newact_mask))[0]) == set(newact_o)
    assert set(np.where(np.asarray(res.free_mask))[0]) == set(fv_o)


@pytest.mark.parametrize("seed", range(8))
def test_cauchy_all_at_bounds(seed):
    """Gradient pushes every coordinate outward: all brk == 0, early exit
    (Cauchy.h:140-145)."""
    n, m = 8, 4
    bh, ob, rng = make_histories(n, m, 3, seed=seed)
    lb = np.zeros(n)
    ub = np.ones(n)
    x0 = np.where(rng.random(n) < 0.5, 0.0, 1.0)
    g = np.where(x0 == 0.0, 1.0, -1.0)   # pushes out of the box
    res = cauchy.cauchy_point(bh, jnp.asarray(x0), jnp.asarray(g),
                              jnp.asarray(lb), jnp.asarray(ub))
    xcp_o, vecc_o, newact_o, fv_o = cauchy_point(ob, x0, g, lb, ub)
    np.testing.assert_allclose(np.asarray(res.xcp), xcp_o)
    assert not np.any(np.asarray(res.newact_mask))
    assert not np.any(np.asarray(res.free_mask))
    assert len(newact_o) == 0 and len(fv_o) == 0


@pytest.mark.parametrize("ncorr", [0, 3, 6, 9])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_subspace_matches_oracle(ncorr, seed):
    n, m = 15, 6
    bh, ob, rng = make_histories(n, m, ncorr, seed=7777 + 100 * seed + ncorr)
    x0, g, lb, ub = random_box_setup(n, rng)

    cp = cauchy.cauchy_point(bh, jnp.asarray(x0), jnp.asarray(g),
                             jnp.asarray(lb), jnp.asarray(ub))
    xcp_o, vecc_o, newact_o, fv_o = cauchy_point(ob, x0, g, lb, ub)

    drt, _ = subspace.subspace_minimize(
        bh, jnp.asarray(x0), cp.xcp, jnp.asarray(g), jnp.asarray(lb),
        jnp.asarray(ub), cp.vecc, cp.newact_mask, cp.free_mask, 10)
    drt_o = subspace_minimize(ob, x0, xcp_o, g, lb, ub, vecc_o,
                              newact_o, fv_o, 10)
    np.testing.assert_allclose(np.asarray(drt), drt_o,
                               rtol=1e-8, atol=1e-9)


def test_subspace_no_free_vars():
    """No free variables: drt = xcp - x0 immediately (SubspaceMin.h:133-138).
    """
    n, m = 6, 4
    bh, _, rng = make_histories(n, m, 2, seed=3)
    x0 = np.zeros(n)
    xcp = rng.standard_normal(n)
    g = rng.standard_normal(n)
    lb = np.full(n, -1.0)
    ub = np.full(n, 1.0)
    free = jnp.zeros(n, bool)
    act = jnp.ones(n, bool)
    wd = jnp.zeros(2 * m)
    drt, _ = subspace.subspace_minimize(bh, jnp.asarray(x0), jnp.asarray(xcp),
                                     jnp.asarray(g), jnp.asarray(lb),
                                     jnp.asarray(ub), wd, act, free, 10)
    np.testing.assert_allclose(np.asarray(drt), xcp - x0)
