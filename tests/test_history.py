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


class TestTriSolveModes:
    """The alternative triangular-solve schedules in apply_hv: the
    ``doubling`` repeated-squaring evaluation and the incremental
    ``rinv`` (BNS R^{-1}) factor.  Both compute the same direction as the
    bit-parity ``sweeps`` default up to reassociation rounding."""

    def _filled_history(self, key, n, m, count, with_rinv=False):
        hist = H.init_history(n, m, jnp.float64, with_rinv=with_rinv)
        for s, y in random_pairs(key, n, count):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
        return hist

    def test_doubling_matches_sweeps(self):
        for m, count in [(4, 2), (4, 4), (4, 9), (6, 6), (16, 40), (5, 7)]:
            hist = self._filled_history(jax.random.PRNGKey(m * 100 + count),
                                        20, m, count)
            v = jax.random.normal(jax.random.PRNGKey(count), (20,),
                                  jnp.float64)
            d0 = H.apply_hv(hist, v, -1.0)
            d1 = H.apply_hv(hist, v, -1.0, tri="doubling")
            np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                       rtol=1e-12, atol=1e-12)

    def test_rinv_matches_sweeps(self):
        for m, count in [(4, 2), (4, 4), (4, 9), (6, 6), (16, 40), (5, 7)]:
            hist = self._filled_history(jax.random.PRNGKey(m * 100 + count),
                                        20, m, count, with_rinv=True)
            v = jax.random.normal(jax.random.PRNGKey(count), (20,),
                                  jnp.float64)
            d0 = H.apply_hv(hist._replace(rinv=None), v, -1.0)
            d1 = H.apply_hv(hist, v, -1.0, tri="rinv")
            np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                       rtol=1e-12, atol=1e-12)

    def test_rinv_is_inverse_of_age_ordered_triu_gram(self):
        """hist.rinv must equal inv(R) with R = triu(S'Y) in age order,
        mapped back to slot order — including after ring wraparound."""
        m, n = 5, 14
        hist = self._filled_history(jax.random.PRNGKey(3), n, m, 13,
                                    with_rinv=True)
        idx = np.asarray(H._age_order_indices(hist))
        s_age = np.asarray(hist.s)[idx]
        y_age = np.asarray(hist.y)[idx]
        r = np.triu(s_age @ y_age.T)
        rinv_age = np.linalg.inv(r)
        rinv_slot = np.asarray(hist.rinv)
        np.testing.assert_allclose(rinv_slot[np.ix_(idx, idx)], rinv_age,
                                   rtol=1e-11, atol=1e-12)

    def test_rinv_rejected_pair_untouched(self):
        m, n = 4, 10
        hist = self._filled_history(jax.random.PRNGKey(4), n, m, 3,
                                    with_rinv=True)
        (s, y), = random_pairs(jax.random.PRNGKey(5), n, 1)
        hist2 = H.add_correction(hist, s, y, jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(hist2.rinv),
                                      np.asarray(hist.rinv))

    def test_rinv_requires_maintained_history(self):
        hist = H.init_history(8, 4, jnp.float64)
        v = jnp.ones((8,), jnp.float64)
        try:
            H.apply_hv(hist, v, -1.0, tri="rinv")
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError without with_rinv")

    def test_default_history_has_no_rinv_leaf(self):
        """The default pytree structure is unchanged (None = empty
        subtree): checkpoints and carries of the sweeps path stay
        byte-compatible."""
        hist = H.init_history(8, 4, jnp.float64)
        assert hist.rinv is None
        leaves = jax.tree.leaves(hist)
        assert len(leaves) == 8  # s y ys theta ncorr ptr sy yy


class TestRinvSolverFuzz:
    """Solver-level fuzz of the rinv direction mode: on random smooth
    strictly-convex problems in f64 the rinv trajectory must reach the
    sweeps trajectory's optimum, and (since the two schedules agree to
    reassociation rounding) the iteration counts must match on nearly
    every instance."""

    def test_random_quartics_match_sweeps(self):
        import functools
        from lbfgspp_tpu import LBFGSParams, minimize

        p = LBFGSParams(epsilon=1e-8, max_iterations=500)

        @functools.partial(jax.jit, static_argnames="direction")
        def solve(a_mat, b, x0, direction):
            def fun(x):
                return (0.5 * x @ (a_mat @ x) - b @ x
                        + 0.1 * jnp.sum(x ** 4))
            return minimize(fun, x0, p, direction=direction)

        rng = np.random.default_rng(0)
        same_niter = 0
        total = 0
        for n in (8, 16):
            for _ in range(6):
                q = rng.standard_normal((n, n))
                a_mat = jnp.asarray(q @ q.T / n + np.eye(n))
                b = jnp.asarray(rng.standard_normal(n))
                x0 = jnp.asarray(rng.standard_normal(n))
                r_sw = solve(a_mat, b, x0, "sweeps")
                r_ri = solve(a_mat, b, x0, "rinv")
                assert int(r_ri.status) == int(r_sw.status)
                np.testing.assert_allclose(np.asarray(r_ri.x),
                                           np.asarray(r_sw.x),
                                           rtol=0, atol=1e-6)
                same_niter += int(r_ri.niter) == int(r_sw.niter)
                total += 1
        # rounding may flip a line-search branch on the odd instance
        assert same_niter >= total - 2, (same_niter, total)


class TestRinvFromGrams:
    """rinv_from_grams reconstructs the slot-order R^{-1} from the cached
    Grams alone; it must match the incrementally-maintained factor."""

    def _hist_pair(self, key, n, m, count):
        hi = H.init_history(n, m, jnp.float64, with_rinv=True)
        for s, y in random_pairs(key, n, count):
            hi = H.add_correction(hi, s, y, jnp.asarray(True))
        return hi

    def test_matches_maintained(self):
        for m, count in [(4, 2), (4, 4), (4, 9), (6, 6), (16, 40), (5, 7)]:
            hi = self._hist_pair(jax.random.PRNGKey(m * 7 + count), 20, m,
                                 count)
            rec = H.rinv_from_grams(hi._replace(rinv=None))
            np.testing.assert_allclose(np.asarray(rec), np.asarray(hi.rinv),
                                       rtol=1e-10, atol=1e-12)

    def test_empty_history(self):
        hi = H.init_history(10, 4, jnp.float64)
        np.testing.assert_array_equal(np.asarray(H.rinv_from_grams(hi)),
                                      np.zeros((4, 4)))


class TestLiftHistoryPairs:
    """_lift_history_pairs: the pair-space lift of a real-space history
    must act on [v; 0] exactly as the original acts on v (zero lo rows
    contribute nothing), in every direction mode."""

    def test_apply_hv_consistent(self):
        from lbfgspp_tpu.batch import _lift_history_pairs

        n, m = 12, 5
        hist = H.init_history(n, m, jnp.float64)
        for s, y in random_pairs(jax.random.PRNGKey(11), n, 7):
            hist = H.add_correction(hist, s, y, jnp.asarray(True))
        v = jax.random.normal(jax.random.PRNGKey(12), (n,), jnp.float64)
        v2 = jnp.concatenate([v, jnp.zeros_like(v)])
        base = np.asarray(H.apply_hv(hist, v, -1.0))
        for direction in ("sweeps", "rinv"):
            lifted = _lift_history_pairs(hist, direction)
            assert lifted.s.shape == (m, 2 * n)
            assert (lifted.rinv is not None) == (direction == "rinv")
            out = np.asarray(H.apply_hv(lifted, v2, -1.0, tri=direction))
            np.testing.assert_allclose(out[:n], base, rtol=1e-10,
                                       atol=1e-12)
            np.testing.assert_allclose(out[n:], 0.0, atol=1e-15)


import pytest

class TestSoftReset:
    """The restart path's SOFT history reset (ncorr=0, theta=1, stale
    [2m, n] data left in place) must be indistinguishable from a fresh
    history: every read is masked by the ring-distance validity test."""

    def _filled(self, n=12, m=5, seed=0, with_rinv=False):
        import numpy as np
        rng = np.random.default_rng(seed)
        h = H.init_history(n, m, jnp.float64, with_rinv=with_rinv)
        for _ in range(m + 2):            # wrap the ring
            s = rng.standard_normal(n)
            y = s * rng.uniform(0.5, 2.0) + 0.1 * rng.standard_normal(n)
            if s @ y < 0:
                y = -y
            h, _ = H.update_history(h, jnp.asarray(s),
                                           jnp.asarray(y),
                                           jnp.asarray(True))
        return h

    @pytest.mark.parametrize("with_rinv", [False, True])
    def test_soft_reset_equals_fresh(self, with_rinv):
        import numpy as np
        n, m = 12, 5
        h = self._filled(n, m, with_rinv=with_rinv)
        soft = h._replace(ncorr=jnp.zeros((), jnp.int32),
                          theta=jnp.ones((), jnp.float64))
        fresh = H.init_history(n, m, jnp.float64,
                                      with_rinv=with_rinv)
        rng = np.random.default_rng(9)
        v = jnp.asarray(rng.standard_normal(n))
        tri = "rinv" if with_rinv else "sweeps"
        # empty-history H application: -v exactly
        np.testing.assert_array_equal(
            np.asarray(H.apply_hv(soft, v, -1.0, tri=tri)),
            np.asarray(H.apply_hv(fresh, v, -1.0, tri=tri)))
        # dense accessors agree (theta * I)
        np.testing.assert_array_equal(np.asarray(H.bmat(soft)),
                                      np.asarray(H.bmat(fresh)))
        # a subsequent update on the soft-reset history produces the SAME
        # OPERATOR as on a fresh one (slot placement may differ — the
        # ring pointer is untouched — but every masked read agrees)
        s = jnp.asarray(rng.standard_normal(n))
        y = s * 1.3
        h1, _ = H.update_history(soft, s, y, jnp.asarray(True))
        h2, _ = H.update_history(fresh, s, y, jnp.asarray(True))
        np.testing.assert_allclose(
            np.asarray(H.apply_hv(h1, v, -1.0, tri=tri)),
            np.asarray(H.apply_hv(h2, v, -1.0, tri=tri)),
            rtol=1e-15)
        np.testing.assert_allclose(np.asarray(H.hmat(h1)),
                                   np.asarray(H.hmat(h2)),
                                   rtol=1e-15)
