"""Unit tests for the L-BFGS history (ring buffer + two-loop recursion)."""

import jax
import jax.numpy as jnp
import numpy as np

import oracle
from lbfgspp_tpu.ops import history as H


def random_pairs(key, n, count):
    """Random (s, y) pairs with positive curvature."""
    pairs = []
    for i in range(count):
        key, k1, k2 = jax.random.split(key, 3)
        s = jax.random.normal(k1, (n,), jnp.float64)
        y = jax.random.normal(k2, (n,), jnp.float64)
        # Force s'y > 0 so every pair is acceptable
        y = y + (1.0 + jnp.abs(jnp.dot(s, y))) * s / jnp.dot(s, s)
        pairs.append((s, y))
    return pairs


class TestRingBuffer:
    def test_matches_oracle_state(self):
        n, m = 12, 4
        hist = H.init_history(n, m, jnp.float64)
        oh = oracle.OracleHistory(n, m)
        for s, y in random_pairs(jax.random.PRNGKey(0), n, 7):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
            oh.add_correction(np.asarray(s), np.asarray(y))
            assert int(hist.ncorr) == oh.ncorr
            assert int(hist.ptr) == oh.ptr
            np.testing.assert_allclose(np.asarray(hist.s), oh.s, rtol=1e-14)
            np.testing.assert_allclose(np.asarray(hist.ys), oh.ys, rtol=1e-14)
            np.testing.assert_allclose(float(hist.theta), oh.theta,
                                       rtol=1e-14)

    def test_rejected_pair_leaves_state_untouched(self):
        """LBFGS.h:161: skipped pairs leave the ring buffer untouched."""
        n, m = 8, 3
        hist = H.init_history(n, m, jnp.float64)
        (s, y), = random_pairs(jax.random.PRNGKey(1), n, 1)
        hist = H.add_correction(hist, s, y, jnp.asarray(True))
        before = jax.tree.map(np.asarray, hist)
        hist2 = H.add_correction(hist, 2 * s, 3 * y, jnp.asarray(False))
        after = jax.tree.map(np.asarray, hist2)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)


class TestTwoLoop:
    def test_matches_oracle(self):
        n, m = 10, 5
        hist = H.init_history(n, m, jnp.float64)
        oh = oracle.OracleHistory(n, m)
        key = jax.random.PRNGKey(2)
        for i, (s, y) in enumerate(random_pairs(key, n, 8)):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
            oh.add_correction(np.asarray(s), np.asarray(y))
            v = jax.random.normal(jax.random.PRNGKey(100 + i), (n,),
                                  jnp.float64)
            got = H.apply_hv(hist, v, -1.0)
            want = oh.apply_hv(np.asarray(v), -1.0)
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13)

    def test_two_loop_equals_dense_hmat(self):
        """apply_Hv(v) must equal hmat() @ v (BFGSMat.h:211-302 pairing)."""
        n, m = 9, 4
        hist = H.init_history(n, m, jnp.float64)
        for s, y in random_pairs(jax.random.PRNGKey(3), n, 6):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
        v = jax.random.normal(jax.random.PRNGKey(4), (n,), jnp.float64)
        via_loop = H.apply_hv(hist, v, 1.0)
        via_dense = H.hmat(hist) @ v
        np.testing.assert_allclose(np.asarray(via_loop),
                                   np.asarray(via_dense), rtol=1e-10)

    def test_empty_history_is_identity_over_theta(self):
        n, m = 7, 6
        hist = H.init_history(n, m, jnp.float64)
        v = jnp.arange(1.0, n + 1.0)
        np.testing.assert_allclose(np.asarray(H.apply_hv(hist, v, 2.0)),
                                   2.0 * np.asarray(v))


class TestDenseAccessors:
    def test_bmat_hmat_are_inverses(self):
        n, m = 8, 4
        hist = H.init_history(n, m, jnp.float64)
        for s, y in random_pairs(jax.random.PRNGKey(5), n, 5):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
        B = np.asarray(H.bmat(hist))
        Hm = np.asarray(H.hmat(hist))
        np.testing.assert_allclose(B @ Hm, np.eye(n), atol=1e-10)

    def test_empty_history_dense(self):
        n, m = 5, 6
        hist = H.init_history(n, m, jnp.float64)
        np.testing.assert_allclose(np.asarray(H.bmat(hist)), np.eye(n))
        np.testing.assert_allclose(np.asarray(H.hmat(hist)), np.eye(n))

    def test_partial_fill(self):
        """ncorr < m: padding must not perturb the result."""
        n, m = 6, 6
        hist = H.init_history(n, m, jnp.float64)
        for s, y in random_pairs(jax.random.PRNGKey(6), n, 2):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
        B = np.asarray(H.bmat(hist))
        Hm = np.asarray(H.hmat(hist))
        np.testing.assert_allclose(B @ Hm, np.eye(n), atol=1e-10)
