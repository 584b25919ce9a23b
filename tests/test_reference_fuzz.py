"""Fuzz parity vs the ACTUAL reference binary (yixuan/LBFGSpp + Eigen).

``scripts/reference_binary/ref_fuzz.cpp`` runs the reference library on
992 random problem instances (shared xorshift64* RNG, see
``fuzz_compare.py``) and the capture is checked in; these tests rebuild
bit-identical instances and diff the JAX solvers against it.

Measured agreement (full sweep in fuzz_compare.py):

- **Diagonal quadratics (elementwise-reproducible arithmetic): 256/256
  L-BFGS runs match the binary's iteration count EXACTLY** across all
  four line searches, two (m, epsilon, epsilon_rel) sets and two sizes;
  final fx agrees to ~1e-15 relative.  **L-BFGS-B: 64/64 exact** on
  random boxes with active/inactive bounds.
- **Separable convex quartics (non-quadratic curvature, reproducible
  arithmetic): 256/256 L-BFGS and 64/64 L-BFGS-B runs exact**; the
  past/delta termination block is exact on all runs the reference
  finished (see test docstrings).
- Pairwise Rosenbrock: iteration counts agree exactly on only ~41% of
  runs — the objective-value reductions are summed in a different order
  than Eigen's SIMD kernels, and on a chaotic trajectory a 1-ulp fx
  difference flips line-search branch decisions (the same sensitivity
  scripts/eigen_order_study.py documents).  Both implementations still
  converge to the same optimum: final fx agrees to <= 1e-8 relative on
  every run.  Branch-order logic for such trajectories is covered by
  the order-matched NumPy oracle suite (tests/test_linesearch_fuzz.py).

To keep suite time bounded, this module re-runs the quadratic sweeps in
full (the bit-compat claim) and a Rosenbrock subset (the convergence
claim).
"""

import importlib.util
import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lbfgspp_tpu as lt
from lbfgspp_tpu.utils.objectives import rosenbrock_fg

_DIR = pathlib.Path(__file__).parent.parent / "scripts" / "reference_binary"

_spec = importlib.util.spec_from_file_location(
    "fuzz_compare", _DIR / "fuzz_compare.py")
fuzz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fuzz)


@pytest.fixture(scope="module")
def gt():
    path = _DIR / "reference_fuzz.json"
    if not path.exists():  # pragma: no cover
        pytest.skip("fuzz capture not present "
                    "(run scripts/reference_binary/run.sh)")
    d = json.loads(path.read_text())
    return ({(r["cfg"], r["rep"]): r for r in d["lbfgs"]},
            {(r["cfg"], r["rep"]): r for r in d["lbfgsb"]})


def _quad_fg(dv, bv):
    def fg(x):
        return 0.5 * jnp.dot(x, dv * x) - jnp.dot(bv, x), dv * x - bv
    return fg


def test_lbfgs_quadratic_bitcompat(gt):
    """Every quadratic run matches the reference binary's iteration
    count exactly; fx to 1e-12."""
    by_key, _ = gt
    for cfg, n, obj, ls, m, eps, eps_rel in fuzz.lbfgs_grid():
        if obj != "quad":
            continue
        d, b, x0 = fuzz.make_lbfgs_problems(cfg, n)
        p = lt.LBFGSParams(m=m, epsilon=eps, epsilon_rel=eps_rel,
                           max_iterations=1000)

        def solve(dv, bv, x):
            return lt.minimize(fun_and_grad=_quad_fg(dv, bv), x0=x,
                               params=p, line_search=ls)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = by_key[(cfg, rep)]
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep, ls)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                err_msg=f"cfg={cfg} rep={rep} ls={ls}")


def test_lbfgsb_bitcompat(gt):
    """Every box run (random boxes, active + inactive bounds) matches
    the binary exactly in iteration count; fx to 1e-12."""
    _, by_key_b = gt
    for cfg, n, m, eps in fuzz.lbfgsb_grid():
        d, b, lb, ub, x0 = fuzz.make_lbfgsb_problems(cfg, n)
        p = lt.LBFGSBParams(m=m, epsilon=eps, max_iterations=1000)

        def solve(dv, bv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=_quad_fg(dv, bv), x0=x,
                                 lb=lbv, ub=ubv, params=p)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(lb), jnp.asarray(ub),
                                       jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = by_key_b[(cfg, rep)]
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                err_msg=f"cfg={cfg} rep={rep}")


def test_lbfgs_rosenbrock_same_optimum(gt):
    """Rosenbrock subset: summation-order chaos precludes exact
    iteration-count parity (see module docstring), but every run must
    land on the reference binary's optimum (fx <= 1e-8 relative) and a
    healthy fraction still matches exactly."""
    by_key, _ = gt
    exact = total = 0
    for cfg, n, obj, ls, m, eps, eps_rel in fuzz.lbfgs_grid():
        if obj != "rosen" or n != 10:
            continue
        if ls not in ("nocedalwright", "morethuente"):
            continue
        d, b, x0 = fuzz.make_lbfgs_problems(cfg, n)
        p = lt.LBFGSParams(m=m, epsilon=eps, epsilon_rel=eps_rel,
                           max_iterations=1000)

        def solve(x):
            return lt.minimize(fun_and_grad=rosenbrock_fg, x0=x,
                               params=p, line_search=ls)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = by_key[(cfg, rep)]
            total += 1
            exact += int(res.niter[rep]) == ref["niter"]
            assert abs(float(res.fx[rep]) - ref["fx"]) <= 1e-8 * \
                max(1.0, abs(ref["fx"])), (cfg, rep, ls)
            assert int(res.status[rep]) in (1, 2), (cfg, rep, ls)
    assert total == 64
    # canary, not a parity claim: n=10 trajectories are the most
    # chaotic slice — observed 13/64 exact (n=4 runs sit near 70%)
    assert exact >= total // 8, (exact, total)


def test_lbfgs_f32_failure_behavior_matches_reference(gt):
    """Scalar=float parity (the reference's own examples instantiate
    float, example-rosenbrock.cpp:33-34).  At f32 with tight tolerances
    the REFERENCE ITSELF throws 'line search failed' on ~44% of random
    quadratics (28/64 in the capture) — the decrease test sits at the
    rounding floor, so throw-vs-converge is decided by the last ulp and
    flips with summation order.  The JAX f32 solver must show the same
    qualitative behavior: a comparable failure fraction (as status
    codes, Status >= LS_INVALID_STEP, never an exception), majority
    per-instance outcome agreement, and agreeing converged minima."""
    path = _DIR / "reference_fuzz_f32.json"
    if not path.exists():  # pragma: no cover
        pytest.skip("f32 capture not present")
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text())["lbfgs_f32"]}

    p = lt.LBFGSParams(epsilon=1e-4, epsilon_rel=1e-4, max_iterations=500)
    agree = total = jax_failures = ref_failures = 0
    for ci, n in enumerate((4, 10)):
        cfg = 3000 + ci
        d = np.empty((32, n), np.float32)
        b = np.empty((32, n), np.float32)
        x0 = np.empty((32, n), np.float32)
        for rep in range(32):
            rng = fuzz.Rng((cfg << 32) | (rep + 1))
            for i in range(n):
                d[rep, i] = np.float32(rng.uniform(0.5, 10.0))
            for i in range(n):
                b[rep, i] = np.float32(rng.uniform(-1.0, 1.0))
            for i in range(n):
                x0[rep, i] = np.float32(rng.uniform(-2.0, 2.0))

        def solve(dv, bv, x):
            return lt.minimize(fun_and_grad=_quad_fg(dv, bv), x0=x,
                               params=p)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(x0))
        for rep in range(32):
            ref = rows[(cfg, rep)]
            ref_failed = ref["niter"] < 0
            jax_failed = int(res.status[rep]) >= 10
            total += 1
            ref_failures += ref_failed
            jax_failures += jax_failed
            agree += ref_failed == jax_failed
            if not ref_failed and not jax_failed:
                # both converged: same minimum (the f32 gradient floor
                # bounds the achievable accuracy)
                assert abs(float(res.fx[rep]) - ref["fx"]) <= \
                    1e-4 * max(1.0, abs(ref["fx"])), (cfg, rep)

    assert total == 64
    # same ballpark of failures (observed: ref 28, jax ~20-26)
    assert 5 <= jax_failures <= 45, jax_failures
    assert agree >= int(0.6 * total), (agree, total)


def test_lbfgsb_special_bounds_bitcompat(gt):
    """Pinned variables (lb == ub, Cauchy.h:113-114) and one-sided
    infinite bounds, randomly mixed: every run must match the binary's
    iteration count exactly (reproducible quadratic arithmetic)."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgsb_special", [])}
    if not rows:  # pragma: no cover
        pytest.skip("special-bounds capture not present")
    p = lt.LBFGSBParams(epsilon=1e-6, max_iterations=1000)
    for ci, n in enumerate((4, 10)):
        cfg = 2100 + ci
        d, b, lb, ub, x0 = fuzz.make_lbfgsb_special_problems(cfg, n)

        def solve(dv, bv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=_quad_fg(dv, bv), x0=x,
                                 lb=lbv, ub=ubv, params=p)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(lb), jnp.asarray(ub),
                                       jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = rows[(cfg, rep)]
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                err_msg=f"cfg={cfg} rep={rep}")


def test_lbfgs_squartic_bitcompat(gt):
    """Separable convex quartic (cfg=4000 block): genuinely
    non-quadratic curvature with elementwise-reproducible arithmetic —
    every run must match the binary's iteration count exactly across
    all four line searches and both param sets (256 runs)."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgs_squartic", [])}
    if not rows:  # pragma: no cover
        pytest.skip("squartic capture not present")
    make_sq = fuzz.squartic_fg_factory(jnp)
    for cfg, n, ls, m, eps, eps_rel in fuzz.squartic_grid():
        c, d, t, x0 = fuzz.make_squartic_problems(cfg, n)
        p = lt.LBFGSParams(m=m, epsilon=eps, epsilon_rel=eps_rel,
                           max_iterations=1000)

        def solve(cv, dv, tv, x):
            return lt.minimize(fun_and_grad=make_sq(cv, dv, tv), x0=x,
                               params=p, line_search=ls)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(c), jnp.asarray(d),
                                       jnp.asarray(t), jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = rows[(cfg, rep)]
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep, ls)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                err_msg=f"cfg={cfg} rep={rep} ls={ls}")


def test_lbfgsb_squartic_bitcompat(gt):
    """Box-constrained quartics (cfg=4500): the GCP/BOXCQP stack on a
    non-quadratic objective — every run matches the binary exactly."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgsb_squartic", [])}
    if not rows:  # pragma: no cover
        pytest.skip("squartic box capture not present")
    make_sq = fuzz.squartic_fg_factory(jnp)
    for cfg, n, m, eps in fuzz.lbfgsb_squartic_grid():
        c, d, t, lb, ub, x0 = fuzz.make_lbfgsb_squartic_problems(cfg, n)
        p = lt.LBFGSBParams(m=m, epsilon=eps, max_iterations=1000)

        def solve(cv, dv, tv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=make_sq(cv, dv, tv), x0=x,
                                 lb=lbv, ub=ubv, params=p)

        res = jax.jit(jax.vmap(solve))(
            jnp.asarray(c), jnp.asarray(d), jnp.asarray(t),
            jnp.asarray(lb), jnp.asarray(ub), jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = rows[(cfg, rep)]
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                err_msg=f"cfg={cfg} rep={rep}")


def test_lbfgs_pastdelta_bitcompat(gt):
    """past/delta objective-decrease termination (LBFGS.h:142-149,
    cfg=4600): the L-BFGS defaults never enable it, so the main fuzz
    doesn't cover this convergence path.  With past=3, delta=1e-9,
    epsilon=1e-12: every run the reference finished matches its
    iteration count exactly.  On runs where the reference THREW (the
    f64 decrease floor reached before the delta test fires — 4/64 in
    the capture) the outcome is decided by the last ulp of the fx
    reduction: the JAX side must either fail the line search the same
    way or terminate via the delta test at the floor (observed 2/2
    each), never report gradient convergence."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgs_pastdelta", [])}
    if not rows:  # pragma: no cover
        pytest.skip("pastdelta capture not present")
    n_thrown = 0
    for cfg, n, ls in fuzz.pastdelta_grid():
        d, b, x0 = fuzz.make_lbfgs_problems(cfg, n)
        p = lt.LBFGSParams(epsilon=1e-12, epsilon_rel=0.0, past=3,
                           delta=1e-9, max_iterations=1000)

        def solve(dv, bv, x):
            return lt.minimize(fun_and_grad=_quad_fg(dv, bv), x0=x,
                               params=p, line_search=ls)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = rows[(cfg, rep)]
            st = int(res.status[rep])
            if ref["niter"] < 0:
                n_thrown += 1
                assert st == int(lt.Status.CONVERGED_DELTA) or st >= 10, \
                    (cfg, rep, ls, st)
                continue
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep, ls)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                err_msg=f"cfg={cfg} rep={rep} ls={ls}")
    assert n_thrown == sum(1 for r in rows.values() if r["niter"] < 0)


# Reference throw message -> the Status class the JAX solver must report
# when it fails on the same instance (each maps to exactly one reference
# throw site; measured: every matching failure used exactly this class).
_LSFAIL_STATUS_MAP = (
    ("'step' exceeds 'step_max'", int(lt.Status.LS_INVALID_STEP)),
    ("'step' is smaller than 'param.min_step'",
     int(lt.Status.LS_INVALID_STEP)),
    ("unable to sufficiently decrease", int(lt.Status.LS_NUMERICAL)),
    ("maximum number of iterations", int(lt.Status.LS_MAX_LINESEARCH)),
    ("larger than the maximum", int(lt.Status.LS_STEP_TOO_LARGE)),
)


def test_lbfgs_linesearch_failure_paths(gt):
    """cfg=4700 block (VERDICT r3 item 8): adversarial budgets/bounds
    drive every line-search FAILURE path — exhaustion best-so-far
    returns (LineSearchMoreThuente.h:602-614,
    LineSearchNocedalWright.h:185-194,263-277), min/max-step boundary
    exits and all five throw sites.  Measured agreement (512 runs):

    - 308/336 reference throws answered by a failure status, each with
      the Status class of the exact throw site;
    - 133/176 reference finishes matched iteration-exactly;
    - every mismatch is a last-ulp flip of the decrease test at the
      eps=1e-9 f64 floor (the same sensitivity as the pastdelta/f32
      blocks): BOTH sides land within ~2e-16 of the true quadratic
      minimum on every run except the max_step-capped variants, where
      both sides strand the SAME number of runs (12 each) at the same
      worst gap."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgs_lsfail", [])}
    if not rows:  # pragma: no cover
        pytest.skip("lsfail capture not present")

    thrown = thrown_match = finish = finish_exact = 0
    jax_far = ref_far = 0
    for cfg, n, ls, mls, mins, maxs in fuzz.lsfail_grid():
        d, b, x0 = fuzz.make_lbfgs_problems(cfg, n)
        fstar = -0.5 * np.sum(b * b / d, axis=1)
        p = lt.LBFGSParams(epsilon=1e-9, epsilon_rel=0.0,
                           max_iterations=400, max_linesearch=mls,
                           min_step=mins, max_step=maxs)

        def solve(dv, bv, x):
            return lt.minimize(fun_and_grad=_quad_fg(dv, bv), x0=x,
                               params=p, line_search=ls)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = rows[(cfg, rep)]
            st = int(res.status[rep])
            scale = max(1.0, abs(fstar[rep]))
            if st < 10:
                gap = (float(res.fx[rep]) - fstar[rep]) / scale
                jax_far += gap > 1e-9
            if ref["niter"] < 0:
                thrown += 1
                if st >= 10:
                    thrown_match += 1
                    expected = [v for k, v in _LSFAIL_STATUS_MAP
                                if k in ref["error"]]
                    assert expected and st == expected[0], \
                        (cfg, rep, ls, ref["error"], st)
            else:
                finish += 1
                ref_far += (ref["fx"] - fstar[rep]) / scale > 1e-9
                if int(res.niter[rep]) == ref["niter"] and st < 10:
                    finish_exact += 1
                    np.testing.assert_allclose(
                        float(res.fx[rep]), ref["fx"], rtol=1e-10,
                        atol=1e-12, err_msg=f"cfg={cfg} rep={rep} ls={ls}")

    assert thrown + finish == 512
    # measured: 308/336 and 133/176; margins for compiler drift
    assert thrown_match >= int(0.85 * thrown), (thrown_match, thrown)
    assert finish_exact >= int(0.70 * finish), (finish_exact, finish)
    # outcome parity: the max_step-capped variants legitimately strand
    # runs above the minimum — the SAME number on both sides
    assert jax_far == ref_far, (jax_far, ref_far)


def test_lbfgsb_linesearch_failure_paths(gt):
    """cfg=4800 block: the L-BFGS-B driver under More-Thuente exhaustion
    budgets (max_linesearch 1/3) and a tiny max_step (forcing best-so-far
    returns through the feasibility cap and the pathological-direction
    rescue, LBFGSB.h:181-197).  The reference never throws on this grid
    (MT's best-so-far semantics absorb every failure); all 96 runs must
    match its iteration count exactly."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgsb_lsfail", [])}
    if not rows:  # pragma: no cover
        pytest.skip("lsfail box capture not present")

    for cfg, n, mls, maxs in fuzz.lsfail_b_grid():
        d, b, lb, ub, x0 = fuzz.make_lbfgsb_problems(cfg, n)
        p = lt.LBFGSBParams(epsilon=1e-9, epsilon_rel=0.0,
                            max_iterations=400, max_linesearch=mls,
                            max_step=maxs)

        def solve(dv, bv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=_quad_fg(dv, bv), x0=x,
                                 lb=lbv, ub=ubv, params=p)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(lb), jnp.asarray(ub),
                                       jnp.asarray(x0))
        for rep in range(fuzz.REPS):
            ref = rows[(cfg, rep)]
            assert ref["niter"] >= 0
            assert int(res.niter[rep]) == ref["niter"], (cfg, rep)
            np.testing.assert_allclose(
                float(res.fx[rep]), ref["fx"], rtol=1e-10, atol=1e-12,
                err_msg=f"cfg={cfg} rep={rep}")


def test_lbfgsb_f32_behavior_matches_reference(gt):
    """Scalar=float L-BFGS-B (cfg=3100 block): the GCP/BOXCQP stack at
    f32 precision on random boxes.  The reference finishes all 64 runs
    (More-Thuente's best-so-far semantics absorb the f32 floor, as in
    the f64 failure-path grid); the JAX side must agree closely despite
    every late branch sitting near the rounding floor.  Measured:
    47/64 iteration-exact, 15 off-by-one, 2 off-by-two; the final
    objective agrees to 1e-4 relative on EVERY run."""
    path = _DIR / "reference_fuzz_f32.json"
    if not path.exists():  # pragma: no cover
        pytest.skip("f32 capture not present")
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgsb_f32", [])}
    if not rows:  # pragma: no cover
        pytest.skip("f32 box capture not present")

    p = lt.LBFGSBParams(epsilon=1e-4, epsilon_rel=1e-4, max_iterations=500)
    n_exact = n_near = total = 0
    for ci, n in enumerate((4, 10)):
        cfg = 3100 + ci
        d = np.empty((32, n), np.float32)
        b = np.empty((32, n), np.float32)
        lb = np.empty((32, n), np.float32)
        ub = np.empty((32, n), np.float32)
        x0 = np.empty((32, n), np.float32)
        for rep in range(32):
            rng = fuzz.Rng((cfg << 32) | (rep + 1))
            for i in range(n):
                d[rep, i] = np.float32(rng.uniform(0.5, 10.0))
            for i in range(n):
                b[rep, i] = np.float32(rng.uniform(-1.0, 1.0))
            for i in range(n):
                a = rng.uniform(-1.5, 1.5)
                w = rng.uniform(0.05, 1.5)
                lb[rep, i] = np.float32(a - w)
                ub[rep, i] = np.float32(a + w)
            for i in range(n):
                x0[rep, i] = np.float32(rng.uniform(float(lb[rep, i]),
                                                    float(ub[rep, i])))

        def solve(dv, bv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=_quad_fg(dv, bv), x0=x,
                                 lb=lbv, ub=ubv, params=p)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(lb), jnp.asarray(ub),
                                       jnp.asarray(x0))
        for rep in range(32):
            ref = rows[(cfg, rep)]
            assert ref["niter"] >= 0        # reference never throws here
            nj = int(res.niter[rep])
            total += 1
            n_exact += nj == ref["niter"]
            n_near += abs(nj - ref["niter"]) <= 2
            # same minimum on every run, f32-floor tolerance
            assert abs(float(res.fx[rep]) - ref["fx"]) <= \
                1e-4 * max(1.0, abs(ref["fx"])), (cfg, rep)

    assert total == 64
    assert n_exact >= int(0.6 * total), n_exact      # measured 47
    assert n_near == total, n_near                   # measured 64


def test_lbfgsb_submin_fallback_bitcompat(gt):
    """cfg=4900 block: ``max_submin=1/2`` forces the BOXCQP active-set
    iterations to hit their cap, driving the 3-level fallback
    (projection -> projected-unconstrained -> unconstrained,
    SubspaceMin.h:277-295) on nearly every outer iteration — a path the
    default-parameter fuzz almost never takes.  All 64 runs match the
    binary's iteration count exactly (reproducible quadratic
    arithmetic), fx to 1e-12 relative."""
    path = _DIR / "reference_fuzz.json"
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgsb_submin", [])}
    if not rows:  # pragma: no cover
        pytest.skip("submin capture not present")

    cfg = 4900
    for n in (4, 10):
        for submin in (1, 2):
            d = np.empty((16, n))
            b = np.empty((16, n))
            lb = np.empty((16, n))
            ub = np.empty((16, n))
            x0 = np.empty((16, n))
            for rep in range(16):
                rng = fuzz.Rng((cfg << 32) | (rep + 1))
                for i in range(n):
                    d[rep, i] = rng.uniform(0.5, 10.0)
                for i in range(n):
                    b[rep, i] = rng.uniform(-4.0, 4.0)
                for i in range(n):
                    a = rng.uniform(-1.0, 1.0)
                    w = rng.uniform(0.05, 0.8)
                    lb[rep, i] = a - w
                    ub[rep, i] = a + w
                for i in range(n):
                    x0[rep, i] = rng.uniform(lb[rep, i], ub[rep, i])
            p = lt.LBFGSBParams(epsilon=1e-6, max_iterations=1000,
                                max_submin=submin)

            def solve(dv, bv, lbv, ubv, x):
                return lt.minimize_b(fun_and_grad=_quad_fg(dv, bv), x0=x,
                                     lb=lbv, ub=ubv, params=p)

            res = jax.jit(jax.vmap(solve))(
                jnp.asarray(d), jnp.asarray(b), jnp.asarray(lb),
                jnp.asarray(ub), jnp.asarray(x0))
            for rep in range(16):
                ref = rows[(cfg, rep)]
                assert ref["niter"] >= 0
                assert int(res.niter[rep]) == ref["niter"], \
                    (cfg, rep, submin)
                np.testing.assert_allclose(
                    float(res.fx[rep]), ref["fx"], rtol=1e-12, atol=1e-14,
                    err_msg=f"cfg={cfg} rep={rep}")
            cfg += 1


def test_lbfgs_f32_quartic_bitcompat(gt):
    """Scalar=float separable quartics (cfg=5100 block, VERDICT r4 task
    6): the non-quadratic line-search curvature family at f32 precision
    under NW and MT.  Measured: ALL 128 runs iteration-exact vs the
    binary with fx agreeing to 1e-4 relative — the per-coordinate
    quartic arithmetic is reproducible across summation orders even in
    f32 (unlike the chaotic Rosenbrock coupling)."""
    path = _DIR / "reference_fuzz_f32.json"
    if not path.exists():  # pragma: no cover
        pytest.skip("f32 capture not present")
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgs_f32_quartic",
                                                      [])}
    if not rows:  # pragma: no cover
        pytest.skip("f32 quartic capture not present")

    make_sq = fuzz.squartic_fg_factory(jnp)
    p = lt.LBFGSParams(epsilon=1e-4, epsilon_rel=1e-4, max_iterations=500)
    n_exact = total = 0
    for li, ls in enumerate(("nocedalwright", "morethuente")):
        for ni, n in enumerate((4, 10)):
            cfg = 5100 + li * 2 + ni
            c = np.empty((32, n), np.float32)
            d = np.empty((32, n), np.float32)
            t = np.empty((32, n), np.float32)
            x0 = np.empty((32, n), np.float32)
            for rep in range(32):
                rng = fuzz.Rng((cfg << 32) | (rep + 1))
                for i in range(n):
                    c[rep, i] = np.float32(rng.uniform(0.1, 2.0))
                for i in range(n):
                    d[rep, i] = np.float32(rng.uniform(0.1, 2.0))
                for i in range(n):
                    t[rep, i] = np.float32(rng.uniform(-1.0, 1.0))
                for i in range(n):
                    x0[rep, i] = np.float32(rng.uniform(-2.0, 2.0))

            def solve(cv, dv, tv, x):
                return lt.minimize(fun_and_grad=make_sq(cv, dv, tv), x0=x,
                                   params=p, line_search=ls)

            res = jax.jit(jax.vmap(solve))(
                jnp.asarray(c), jnp.asarray(d), jnp.asarray(t),
                jnp.asarray(x0))
            for rep in range(32):
                ref = rows[(cfg, rep)]
                assert ref["niter"] >= 0      # reference finishes all
                total += 1
                n_exact += int(res.niter[rep]) == ref["niter"]
                assert abs(float(res.fx[rep]) - ref["fx"]) <= \
                    1e-4 * max(1.0, abs(ref["fx"])), (cfg, rep, ls)
    assert total == 128
    assert n_exact >= 120, n_exact          # measured 128/128


def test_lbfgsb_f32_pinned_inf_bitcompat(gt):
    """Scalar=float pinned (lb==ub) and one-sided-infinite boxes
    (cfg=5200 block): the f64 cfg=2100 kind mix at f32 precision.
    Measured: 55/64 iteration-exact, all 64 within two iterations, the
    final objective agreeing to 1e-4 relative on every run."""
    path = _DIR / "reference_fuzz_f32.json"
    if not path.exists():  # pragma: no cover
        pytest.skip("f32 capture not present")
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get(
                "lbfgsb_f32_pinned_inf", [])}
    if not rows:  # pragma: no cover
        pytest.skip("f32 pinned/inf capture not present")

    p = lt.LBFGSBParams(epsilon=1e-4, epsilon_rel=1e-4, max_iterations=500)
    n_exact = n_near = total = 0
    for ni, n in enumerate((4, 10)):
        cfg = 5200 + ni
        d = np.empty((32, n), np.float32)
        b = np.empty((32, n), np.float32)
        lb = np.empty((32, n), np.float32)
        ub = np.empty((32, n), np.float32)
        x0 = np.empty((32, n), np.float32)
        for rep in range(32):
            rng = fuzz.Rng((cfg << 32) | (rep + 1))
            for i in range(n):
                d[rep, i] = np.float32(rng.uniform(0.5, 10.0))
            for i in range(n):
                b[rep, i] = np.float32(rng.uniform(-1.0, 1.0))
            for i in range(n):
                a = rng.uniform(-1.5, 1.5)
                w = rng.uniform(0.05, 1.5)
                kind = rng.uniform()
                if kind < 0.2:
                    lb[rep, i] = ub[rep, i] = np.float32(a)
                elif kind < 0.35:
                    lb[rep, i] = -np.inf
                    ub[rep, i] = np.float32(a + w)
                elif kind < 0.5:
                    lb[rep, i] = np.float32(a - w)
                    ub[rep, i] = np.inf
                else:
                    lb[rep, i] = np.float32(a - w)
                    ub[rep, i] = np.float32(a + w)
            for i in range(n):
                lo = max(float(lb[rep, i]), -3.0)
                hi = min(float(ub[rep, i]), 3.0)
                x0[rep, i] = np.float32(rng.uniform(lo, hi))

        def solve(dv, bv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=_quad_fg(dv, bv), x0=x,
                                 lb=lbv, ub=ubv, params=p)

        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(lb), jnp.asarray(ub),
                                       jnp.asarray(x0))
        for rep in range(32):
            ref = rows[(cfg, rep)]
            assert ref["niter"] >= 0
            total += 1
            nj = int(res.niter[rep])
            n_exact += nj == ref["niter"]
            n_near += abs(nj - ref["niter"]) <= 2
            assert abs(float(res.fx[rep]) - ref["fx"]) <= \
                1e-4 * max(1.0, abs(ref["fx"])), (cfg, rep)
    assert total == 64
    assert n_exact >= 44, n_exact           # measured 55
    assert n_near == total, n_near          # measured 64


def test_lbfgs_f32_failure_paths(gt):
    """Scalar=float line-search failure grid (cfg=5300 block): the f64
    cfg=4700 adversarial budgets at f32 precision (trial-cap
    exhaustion, tiny max_step, narrow [min,max] window; NW + MT).  The
    capture has 75/96 reference throws.  Measured outcome-class
    accounting: 72/75 throws answered with a failure status; of the 21
    reference finishes, 17 JAX runs also finish (16 iteration-exact) —
    every residual sits on the last-ulp decrease-floor boundary exactly
    as in the f64 grid."""
    path = _DIR / "reference_fuzz_f32.json"
    if not path.exists():  # pragma: no cover
        pytest.skip("f32 capture not present")
    rows = {(r["cfg"], r["rep"]): r
            for r in json.loads(path.read_text()).get("lbfgs_f32_lsfail",
                                                      [])}
    if not rows:  # pragma: no cover
        pytest.skip("f32 failure-grid capture not present")

    variants = [(1, 1e-20, 1e20), (20, 1e-20, 1e-3), (5, 0.3, 0.5)]
    total = ref_thrown = match_fail = finish_exact = 0
    for ni, n in enumerate((4, 10)):
        for vi, (mls, mins, maxs) in enumerate(variants):
            for li, ls in enumerate(("nocedalwright", "morethuente")):
                cfg = 5300 + ni * 6 + vi * 2 + li
                d = np.empty((8, n), np.float32)
                b = np.empty((8, n), np.float32)
                x0 = np.empty((8, n), np.float32)
                for rep in range(8):
                    rng = fuzz.Rng((cfg << 32) | (rep + 1))
                    for i in range(n):
                        d[rep, i] = np.float32(rng.uniform(0.5, 10.0))
                    for i in range(n):
                        b[rep, i] = np.float32(rng.uniform(-1.0, 1.0))
                    for i in range(n):
                        x0[rep, i] = np.float32(rng.uniform(-2.0, 2.0))
                p = lt.LBFGSParams(epsilon=1e-6, epsilon_rel=0.0,
                                   max_iterations=400, max_linesearch=mls,
                                   min_step=mins, max_step=maxs)

                def solve(dv, bv, x):
                    return lt.minimize(fun_and_grad=_quad_fg(dv, bv),
                                       x0=x, params=p, line_search=ls)

                res = jax.jit(jax.vmap(solve))(
                    jnp.asarray(d), jnp.asarray(b), jnp.asarray(x0))
                for rep in range(8):
                    ref = rows[(cfg, rep)]
                    st = int(res.status[rep])
                    total += 1
                    if ref["niter"] < 0:
                        ref_thrown += 1
                        match_fail += st >= 10
                    elif st < 10:
                        finish_exact += int(res.niter[rep]) == ref["niter"]
    assert total == 96
    assert ref_thrown == 75                  # capture content, fixed
    assert match_fail >= 65, match_fail      # measured 72
    assert finish_exact >= 12, finish_exact  # measured 16
