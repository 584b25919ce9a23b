"""Parity tests for the Pallas-fused batched apply_hv (ops/fused.py).

Runs the kernel in interpreter mode on CPU so the fused math — including
block tiling, padding, and the custom-vmap dispatch — is validated without
TPU hardware.  The TPU compiled path runs the identical kernel body.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbfgspp_tpu.ops import fused, history as H
from test_bmat import make_histories


def batched_history(batch, n, m, ncorrs, seed=0):
    rng = np.random.default_rng(seed)

    def build(ncorr):
        hist = H.init_history(n, m, jnp.float64)
        for _ in range(ncorr):
            s = rng.standard_normal(n)
            y = s * 0.3 + rng.standard_normal(n)
            if s @ y < 0:
                y = -y
            y = y + 0.1 * s
            hist = H.add_correction(hist, jnp.asarray(s), jnp.asarray(y),
                                    jnp.asarray(True))
        return hist

    hists = [build(nc) for nc in ncorrs]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *hists)


@pytest.mark.parametrize("batch,ncorrs", [
    (4, (0, 1, 3, 6)),        # mixed fill levels incl. empty
    (5, (6, 9, 2, 7, 6)),     # wrapped ring buffers, odd batch (padding)
])
def test_fused_matches_xla_interpret(batch, ncorrs, monkeypatch):
    n, m = 24, 6
    monkeypatch.setattr(fused, "INTERPRET", True)
    monkeypatch.setattr(fused, "B_TILE", 4)     # force padding/tiling paths
    hist = batched_history(batch, n, m, ncorrs)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((batch, n)))

    want = jax.vmap(lambda h, vv: H.apply_hv(h, vv, -1.0))(hist, v)

    got = fused._batched_fused(
        hist.s, hist.y,
        *_masks(hist, v.dtype),
        hist.theta, v, -1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-13)


def _masks(hist, dtype):
    msy, msyT, ys_safe, vmask = fused._prep_masks(
        hist.ys, hist.ptr, hist.ncorr, hist.sy, hist.yy, dtype)
    return msy, msyT, hist.yy, ys_safe, vmask


def test_custom_vmap_dispatch(monkeypatch):
    """vmap of the custom-vmap function hits the batched kernel and matches
    per-instance results."""
    n, m, batch = 16, 4, 6
    monkeypatch.setattr(fused, "INTERPRET", True)
    monkeypatch.setattr(fused, "B_TILE", 8)
    hist = batched_history(batch, n, m, (0, 1, 2, 4, 5, 3))
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((batch, n)))

    fn = fused.make_apply_hv(-1.0)
    got = jax.vmap(fn)(hist.s, hist.y, hist.ys, hist.theta, hist.ptr,
                       hist.ncorr, hist.sy, hist.yy, v)
    want = jax.vmap(lambda h, vv: H.apply_hv(h, vv, -1.0))(hist, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-13)

    # Unbatched call goes through the XLA fallback and agrees too.
    h0 = jax.tree.map(lambda x: x[0], hist)
    got0 = fn(h0.s, h0.y, h0.ys, h0.theta, h0.ptr, h0.ncorr, h0.sy, h0.yy,
              v[0])
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want[0]),
                               rtol=1e-12, atol=1e-13)


def test_fused_available_gating():
    # On the CPU test backend the fused path must be off by default.
    assert not fused.fused_available(jnp.float64, None)
    assert not fused.fused_available(jnp.float32, "feat")


@pytest.mark.parametrize("batch,ncorrs", [
    (4, (0, 1, 3, 6)),
    (5, (6, 9, 2, 7, 6)),
])
def test_fused_mmajor_matches_xla_interpret(batch, ncorrs, monkeypatch):
    """Round-2 m-major kernel ([2m, B, n] packing): bit-level parity with
    the XLA path in interpreter mode, including padding/tiling."""
    n, m = 24, 6
    monkeypatch.setattr(fused, "INTERPRET", True)
    monkeypatch.setattr(fused, "B_TILE2", 4)
    hist = batched_history(batch, n, m, ncorrs)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((batch, n)))

    want = jax.vmap(lambda h, vv: H.apply_hv(h, vv, -1.0))(hist, v)

    got = fused._batched_fused_mmajor(
        hist.s, hist.y,
        *_masks(hist, v.dtype),
        hist.theta, v, -1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-13)
