"""Diff the JAX solvers against the reference-binary fuzz capture.

Rebuilds the exact problem instances from the shared xorshift64* RNG
(ref_fuzz.cpp) and reports agreement statistics.  Run from the repo
root with the CPU/f64 config:

    /opt/venv/bin/python scripts/reference_binary/fuzz_compare.py
"""

import json
import pathlib
import sys

import numpy as np

MASK = (1 << 64) - 1
_SPLIT = 0x9E3779B97F4A7C15
_MULT = 0x2545F4914F6CDD1D


class Rng:
    """Bit-exact mirror of ref_fuzz.cpp's xorshift64*."""

    def __init__(self, seed):
        self.s = (seed & MASK) or _SPLIT

    def next_u64(self):
        s = self.s
        s ^= s >> 12
        s = (s ^ (s << 25)) & MASK
        s ^= s >> 27
        self.s = s
        return (s * _MULT) & MASK

    def uniform(self, lo=0.0, hi=1.0):
        u = (self.next_u64() >> 11) * (1.0 / 9007199254740992.0)
        return lo + (hi - lo) * u


REPS = 16
NS = (4, 10)
LSES = ("nocedalwright", "morethuente", "backtracking", "bracketing")
PSETS = ((6, 1e-5, 1e-5), (3, 1e-6, 0.0))


def lbfgs_grid():
    """(cfg_id, n, obj, ls, m, eps, eps_rel) in ref_fuzz.cpp order."""
    cfg = 1000
    for n in NS:
        for obj in ("quad", "rosen"):
            for m, eps, eps_rel in PSETS:
                for ls in LSES:
                    yield cfg, n, obj, ls, m, eps, eps_rel
                    cfg += 1


def lbfgsb_grid():
    cfg = 2000
    for n in NS:
        for m, eps in ((6, 1e-5), (3, 1e-6)):
            yield cfg, n, m, eps
            cfg += 1


def make_lbfgs_problems(cfg, n):
    d = np.empty((REPS, n))
    b = np.empty((REPS, n))
    x0 = np.empty((REPS, n))
    for rep in range(REPS):
        rng = Rng((cfg << 32) | (rep + 1))
        for i in range(n):
            d[rep, i] = rng.uniform(0.5, 10.0)
        for i in range(n):
            b[rep, i] = rng.uniform(-1.0, 1.0)
        for i in range(n):
            x0[rep, i] = rng.uniform(-2.0, 2.0)
    return d, b, x0


def make_lbfgsb_special_problems(cfg, n):
    """Pinned (lb==ub) and one-sided-infinite bounds mixed in; mirrors
    the cfg=2100 block of ref_fuzz.cpp exactly."""
    d = np.empty((REPS, n))
    b = np.empty((REPS, n))
    lb = np.empty((REPS, n))
    ub = np.empty((REPS, n))
    x0 = np.empty((REPS, n))
    for rep in range(REPS):
        rng = Rng((cfg << 32) | (rep + 1))
        for i in range(n):
            d[rep, i] = rng.uniform(0.5, 10.0)
        for i in range(n):
            b[rep, i] = rng.uniform(-1.0, 1.0)
        for i in range(n):
            a = rng.uniform(-1.5, 1.5)
            w = rng.uniform(0.05, 1.5)
            kind = rng.uniform()
            if kind < 0.2:
                lb[rep, i] = ub[rep, i] = a
            elif kind < 0.35:
                lb[rep, i] = -np.inf
                ub[rep, i] = a + w
            elif kind < 0.5:
                lb[rep, i] = a - w
                ub[rep, i] = np.inf
            else:
                lb[rep, i] = a - w
                ub[rep, i] = a + w
        for i in range(n):
            lo = max(lb[rep, i], -3.0)
            hi = min(ub[rep, i], 3.0)
            x0[rep, i] = rng.uniform(lo, hi)
    return d, b, lb, ub, x0


def squartic_grid():
    """(cfg_id, n, ls, m, eps, eps_rel) for the cfg=4000 block."""
    cfg = 4000
    for n in NS:
        for m, eps, eps_rel in PSETS:
            for ls in LSES:
                yield cfg, n, ls, m, eps, eps_rel
                cfg += 1


def lbfgsb_squartic_grid():
    cfg = 4500
    for n in NS:
        for m, eps in ((6, 1e-5), (3, 1e-6)):
            yield cfg, n, m, eps
            cfg += 1


def pastdelta_grid():
    """(cfg_id, n, ls) for the cfg=4600 block (past=3, delta=1e-9)."""
    cfg = 4600
    for n in NS:
        for ls in ("nocedalwright", "morethuente"):
            yield cfg, n, ls
            cfg += 1


# Line-search failure-path variants (cfg=4700 block):
# (max_linesearch, min_step, max_step) — see ref_fuzz.cpp for the intent
# of each variant.
LSFAIL_VARIANTS = ((1, 1e-20, 1e20), (2, 1e-20, 1e20),
                   (20, 1e-20, 1e-3), (5, 0.3, 0.5))
# (max_linesearch, max_step) for the L-BFGS-B block (cfg=4800).
LSFAIL_B_VARIANTS = ((1, 1e20), (3, 1e20), (20, 1e-3))


def lsfail_grid():
    """(cfg_id, n, ls, mls, min_step, max_step) for the cfg=4700 block
    (adversarial line-search budgets/bounds; epsilon=1e-9, eps_rel=0,
    max_iterations=400, diagonal quadratics)."""
    cfg = 4700
    for n in NS:
        for mls, mins, maxs in LSFAIL_VARIANTS:
            for ls in LSES:
                yield cfg, n, ls, mls, mins, maxs
                cfg += 1


def lsfail_b_grid():
    """(cfg_id, n, mls, max_step) for the cfg=4800 block (L-BFGS-B,
    More-Thuente under exhaustion budgets / tiny max_step)."""
    cfg = 4800
    for n in NS:
        for mls, maxs in LSFAIL_B_VARIANTS:
            yield cfg, n, mls, maxs
            cfg += 1


def _draw_squartic(rng, n):
    c = np.empty(n)
    d = np.empty(n)
    t = np.empty(n)
    for i in range(n):
        c[i] = rng.uniform(0.1, 2.0)
    for i in range(n):
        d[i] = rng.uniform(0.1, 2.0)
    for i in range(n):
        t[i] = rng.uniform(-1.0, 1.0)
    return c, d, t


def make_squartic_problems(cfg, n):
    c = np.empty((REPS, n))
    d = np.empty((REPS, n))
    t = np.empty((REPS, n))
    x0 = np.empty((REPS, n))
    for rep in range(REPS):
        rng = Rng((cfg << 32) | (rep + 1))
        c[rep], d[rep], t[rep] = _draw_squartic(rng, n)
        for i in range(n):
            x0[rep, i] = rng.uniform(-2.0, 2.0)
    return c, d, t, x0


def make_lbfgsb_squartic_problems(cfg, n):
    c = np.empty((REPS, n))
    d = np.empty((REPS, n))
    t = np.empty((REPS, n))
    lb = np.empty((REPS, n))
    ub = np.empty((REPS, n))
    x0 = np.empty((REPS, n))
    for rep in range(REPS):
        rng = Rng((cfg << 32) | (rep + 1))
        c[rep], d[rep], t[rep] = _draw_squartic(rng, n)
        for i in range(n):
            a = rng.uniform(-1.5, 1.5)
            w = rng.uniform(0.05, 1.5)
            lb[rep, i] = a - w
            ub[rep, i] = a + w
        for i in range(n):
            x0[rep, i] = rng.uniform(lb[rep, i], ub[rep, i])
    return c, d, t, lb, ub, x0


def squartic_fg_factory(jnp):
    """Objective with the EXACT per-coordinate operation order of
    ref_fuzz.cpp's SQuartic (left-to-right products)."""
    def make(cv, dv, tv):
        def fg(x):
            e = x - tv
            e2 = e * e
            g = 4.0 * cv * e2 * e + dv * e
            return jnp.sum(cv * e2 * e2 + 0.5 * dv * e2), g
        return fg
    return make


def make_lbfgsb_problems(cfg, n):
    d = np.empty((REPS, n))
    b = np.empty((REPS, n))
    lb = np.empty((REPS, n))
    ub = np.empty((REPS, n))
    x0 = np.empty((REPS, n))
    for rep in range(REPS):
        rng = Rng((cfg << 32) | (rep + 1))
        for i in range(n):
            d[rep, i] = rng.uniform(0.5, 10.0)
        for i in range(n):
            b[rep, i] = rng.uniform(-1.0, 1.0)
        for i in range(n):
            a = rng.uniform(-1.5, 1.5)
            w = rng.uniform(0.05, 1.5)
            lb[rep, i] = a - w
            ub[rep, i] = a + w
        for i in range(n):
            x0[rep, i] = rng.uniform(lb[rep, i], ub[rep, i])
    return d, b, lb, ub, x0


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).parents[2]))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import lbfgspp_tpu as lt
    from lbfgspp_tpu.utils.objectives import rosenbrock_fg

    here = pathlib.Path(__file__).parent
    gt = json.loads((here / "reference_fuzz.json").read_text())
    by_key = {(r["cfg"], r["rep"]): r for r in gt["lbfgs"]}
    by_key_b = {(r["cfg"], r["rep"]): r for r in gt["lbfgsb"]}

    def quad_fg(dv, bv):
        def fg(x):
            g = dv * x - bv
            return 0.5 * jnp.dot(x, dv * x) - jnp.dot(bv, x), g
        return fg

    n_exact = n_off1 = n_worse = 0
    fx_diffs = []
    rows = []
    for cfg, n, obj, ls, m, eps, eps_rel in lbfgs_grid():
        d, b, x0 = make_lbfgs_problems(cfg, n)
        p = lt.LBFGSParams(m=m, epsilon=eps, epsilon_rel=eps_rel,
                           max_iterations=1000)
        if obj == "quad":
            def solve(dv, bv, x):
                return lt.minimize(fun_and_grad=quad_fg(dv, bv), x0=x,
                                   params=p, line_search=ls)
            res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                           jnp.asarray(x0))
        else:
            def solve(x):
                return lt.minimize(fun_and_grad=rosenbrock_fg, x0=x,
                                   params=p, line_search=ls)
            res = jax.jit(jax.vmap(solve))(jnp.asarray(x0))
        for rep in range(REPS):
            ref = by_key[(cfg, rep)]
            nj = int(res.niter[rep])
            nr = ref["niter"]
            if nj == nr:
                n_exact += 1
            elif abs(nj - nr) <= 1:
                n_off1 += 1
            else:
                n_worse += 1
                rows.append((cfg, rep, obj, ls, m, eps, eps_rel, nj, nr))
            fr = ref["fx"]
            fx_diffs.append(abs(float(res.fx[rep]) - fr) /
                            max(1.0, abs(fr)))

    total = n_exact + n_off1 + n_worse
    print(f"L-BFGS: {total} runs — exact niter {n_exact} "
          f"({100*n_exact/total:.1f}%), off-by-1 {n_off1}, "
          f"worse {n_worse}")
    print(f"  fx rel diff: max {max(fx_diffs):.3e}")
    for r in rows[:20]:
        print("  MISMATCH", r)

    n_exact = n_off1 = n_worse = 0
    fx_diffs = []
    rows = []
    for cfg, n, m, eps in lbfgsb_grid():
        d, b, lb, ub, x0 = make_lbfgsb_problems(cfg, n)
        p = lt.LBFGSBParams(m=m, epsilon=eps, max_iterations=1000)

        def solve(dv, bv, lbv, ubv, x):
            return lt.minimize_b(fun_and_grad=quad_fg(dv, bv), x0=x,
                                 lb=lbv, ub=ubv, params=p)
        res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                       jnp.asarray(lb), jnp.asarray(ub),
                                       jnp.asarray(x0))
        for rep in range(REPS):
            ref = by_key_b[(cfg, rep)]
            nj = int(res.niter[rep])
            nr = ref["niter"]
            if nj == nr:
                n_exact += 1
            elif abs(nj - nr) <= 1:
                n_off1 += 1
            else:
                n_worse += 1
                rows.append((cfg, rep, m, eps, nj, nr))
            fr = ref["fx"]
            fx_diffs.append(abs(float(res.fx[rep]) - fr) /
                            max(1.0, abs(fr)))

    total = n_exact + n_off1 + n_worse
    print(f"L-BFGS-B: {total} runs — exact niter {n_exact} "
          f"({100*n_exact/total:.1f}%), off-by-1 {n_off1}, "
          f"worse {n_worse}")
    print(f"  fx rel diff: max {max(fx_diffs):.3e}")
    for r in rows[:20]:
        print("  MISMATCH", r)

    # cfg=2100 block: pinned (lb==ub) and one-sided-infinite bounds.
    by_key_s = {(r["cfg"], r["rep"]): r
                for r in gt.get("lbfgsb_special", [])}
    if by_key_s:
        n_exact = n_off1 = n_worse = 0
        fx_diffs = []
        rows = []
        p = lt.LBFGSBParams(epsilon=1e-6, max_iterations=1000)
        for ci, n in enumerate(NS):
            cfg = 2100 + ci
            d, b, lb, ub, x0 = make_lbfgsb_special_problems(cfg, n)

            def solve(dv, bv, lbv, ubv, x):
                return lt.minimize_b(fun_and_grad=quad_fg(dv, bv), x0=x,
                                     lb=lbv, ub=ubv, params=p)
            res = jax.jit(jax.vmap(solve))(
                jnp.asarray(d), jnp.asarray(b), jnp.asarray(lb),
                jnp.asarray(ub), jnp.asarray(x0))
            for rep in range(REPS):
                ref = by_key_s[(cfg, rep)]
                nj = int(res.niter[rep])
                nr = ref["niter"]
                if nj == nr:
                    n_exact += 1
                elif abs(nj - nr) <= 1:
                    n_off1 += 1
                else:
                    n_worse += 1
                    rows.append((cfg, rep, nj, nr))
                fr = ref["fx"]
                fx_diffs.append(abs(float(res.fx[rep]) - fr) /
                                max(1.0, abs(fr)))
        total = n_exact + n_off1 + n_worse
        print(f"L-BFGS-B special bounds (pinned/inf): {total} runs — "
              f"exact niter {n_exact} ({100*n_exact/total:.1f}%), "
              f"off-by-1 {n_off1}, worse {n_worse}")
        print(f"  fx rel diff: max {max(fx_diffs):.3e}")
        for r in rows[:20]:
            print("  MISMATCH", r)

    make_sq = squartic_fg_factory(jnp)

    # cfg=4000 block: separable convex quartic, L-BFGS.
    by_key_q = {(r["cfg"], r["rep"]): r
                for r in gt.get("lbfgs_squartic", [])}
    if by_key_q:
        n_exact = n_off1 = n_worse = 0
        fx_diffs = []
        rows = []
        for cfg, n, ls, m, eps, eps_rel in squartic_grid():
            c, d, t, x0 = make_squartic_problems(cfg, n)
            p = lt.LBFGSParams(m=m, epsilon=eps, epsilon_rel=eps_rel,
                               max_iterations=1000)

            def solve(cv, dv, tv, x):
                return lt.minimize(fun_and_grad=make_sq(cv, dv, tv), x0=x,
                                   params=p, line_search=ls)
            res = jax.jit(jax.vmap(solve))(jnp.asarray(c), jnp.asarray(d),
                                           jnp.asarray(t), jnp.asarray(x0))
            for rep in range(REPS):
                ref = by_key_q[(cfg, rep)]
                nj = int(res.niter[rep])
                nr = ref["niter"]
                if nj == nr:
                    n_exact += 1
                elif abs(nj - nr) <= 1:
                    n_off1 += 1
                else:
                    n_worse += 1
                    rows.append((cfg, rep, ls, m, nj, nr))
                fr = ref["fx"]
                fx_diffs.append(abs(float(res.fx[rep]) - fr) /
                                max(1.0, abs(fr)))
        total = n_exact + n_off1 + n_worse
        print(f"L-BFGS separable quartic: {total} runs — exact niter "
              f"{n_exact} ({100*n_exact/total:.1f}%), off-by-1 {n_off1}, "
              f"worse {n_worse}")
        print(f"  fx rel diff: max {max(fx_diffs):.3e}")
        for r in rows[:20]:
            print("  MISMATCH", r)

    # cfg=4500 block: quartic L-BFGS-B.
    by_key_qb = {(r["cfg"], r["rep"]): r
                 for r in gt.get("lbfgsb_squartic", [])}
    if by_key_qb:
        n_exact = n_off1 = n_worse = 0
        fx_diffs = []
        rows = []
        for cfg, n, m, eps in lbfgsb_squartic_grid():
            c, d, t, lb, ub, x0 = make_lbfgsb_squartic_problems(cfg, n)
            p = lt.LBFGSBParams(m=m, epsilon=eps, max_iterations=1000)

            def solve(cv, dv, tv, lbv, ubv, x):
                return lt.minimize_b(fun_and_grad=make_sq(cv, dv, tv),
                                     x0=x, lb=lbv, ub=ubv, params=p)
            res = jax.jit(jax.vmap(solve))(
                jnp.asarray(c), jnp.asarray(d), jnp.asarray(t),
                jnp.asarray(lb), jnp.asarray(ub), jnp.asarray(x0))
            for rep in range(REPS):
                ref = by_key_qb[(cfg, rep)]
                nj = int(res.niter[rep])
                nr = ref["niter"]
                if nj == nr:
                    n_exact += 1
                elif abs(nj - nr) <= 1:
                    n_off1 += 1
                else:
                    n_worse += 1
                    rows.append((cfg, rep, m, nj, nr))
                fr = ref["fx"]
                fx_diffs.append(abs(float(res.fx[rep]) - fr) /
                                max(1.0, abs(fr)))
        total = n_exact + n_off1 + n_worse
        print(f"L-BFGS-B separable quartic: {total} runs — exact niter "
              f"{n_exact} ({100*n_exact/total:.1f}%), off-by-1 {n_off1}, "
              f"worse {n_worse}")
        print(f"  fx rel diff: max {max(fx_diffs):.3e}")
        for r in rows[:20]:
            print("  MISMATCH", r)

    # cfg=4600 block: past/delta objective-decrease termination.
    by_key_pd = {(r["cfg"], r["rep"]): r
                 for r in gt.get("lbfgs_pastdelta", [])}
    if by_key_pd:
        n_exact = n_off1 = n_worse = 0
        fx_diffs = []
        rows = []
        for cfg, n, ls in pastdelta_grid():
            d, b, x0 = make_lbfgs_problems(cfg, n)
            p = lt.LBFGSParams(epsilon=1e-12, epsilon_rel=0.0, past=3,
                               delta=1e-9, max_iterations=1000)

            def solve(dv, bv, x):
                return lt.minimize(fun_and_grad=quad_fg(dv, bv), x0=x,
                                   params=p, line_search=ls)
            res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                           jnp.asarray(x0))
            for rep in range(REPS):
                ref = by_key_pd[(cfg, rep)]
                nj = int(res.niter[rep])
                nr = ref["niter"]
                if nr < 0:
                    # reference threw (f64 decrease floor before the
                    # delta test fired); JAX must report a line-search
                    # failure status on the same instance
                    if int(res.status[rep]) >= 10:
                        n_exact += 1
                    else:
                        n_worse += 1
                        rows.append((cfg, rep, ls, nj, "threw"))
                    continue
                if nj == nr:
                    n_exact += 1
                elif abs(nj - nr) <= 1:
                    n_off1 += 1
                else:
                    n_worse += 1
                    rows.append((cfg, rep, ls, nj, nr))
                fr = ref["fx"]
                fx_diffs.append(abs(float(res.fx[rep]) - fr) /
                                max(1.0, abs(fr)))
        total = n_exact + n_off1 + n_worse
        print(f"L-BFGS past/delta termination: {total} runs — exact niter "
              f"{n_exact} ({100*n_exact/total:.1f}%), off-by-1 {n_off1}, "
              f"worse {n_worse}")
        print(f"  fx rel diff: max {max(fx_diffs):.3e}")
        for r in rows[:20]:
            print("  MISMATCH", r)

    # cfg=4700/4800 blocks: line-search FAILURE paths (exhaustion,
    # best-so-far returns, step-boundary exits/throws).
    by_key_lf = {(r["cfg"], r["rep"]): r
                 for r in gt.get("lbfgs_lsfail", [])}
    if by_key_lf:
        n_thrown_match = n_thrown_miss = n_exact = n_finish_miss = 0
        for cfg, n, ls, mls, mins, maxs in lsfail_grid():
            d, b, x0 = make_lbfgs_problems(cfg, n)
            p = lt.LBFGSParams(epsilon=1e-9, epsilon_rel=0.0,
                               max_iterations=400, max_linesearch=mls,
                               min_step=mins, max_step=maxs)

            def solve(dv, bv, x):
                return lt.minimize(fun_and_grad=quad_fg(dv, bv), x0=x,
                                   params=p, line_search=ls)
            res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                           jnp.asarray(x0))
            for rep in range(REPS):
                ref = by_key_lf[(cfg, rep)]
                st = int(res.status[rep])
                if ref["niter"] < 0:
                    if st >= 10:
                        n_thrown_match += 1
                    else:
                        n_thrown_miss += 1
                elif int(res.niter[rep]) == ref["niter"] and st < 10:
                    n_exact += 1
                else:
                    n_finish_miss += 1
        total = n_thrown_match + n_thrown_miss + n_exact + n_finish_miss
        print(f"L-BFGS line-search failure paths: {total} runs — thrown "
              f"matched {n_thrown_match}, thrown mismatched {n_thrown_miss},"
              f" finish exact {n_exact}, finish mismatched {n_finish_miss}")
        print("  (mismatches are last-ulp decrease-floor flips at "
              "epsilon=1e-9; both sides land within ~2e-16 of the true "
              "minimum — see tests/test_reference_fuzz.py)")

    by_key_lfb = {(r["cfg"], r["rep"]): r
                  for r in gt.get("lbfgsb_lsfail", [])}
    if by_key_lfb:
        n_exact = n_miss = 0
        for cfg, n, mls, maxs in lsfail_b_grid():
            d, b, lb, ub, x0 = make_lbfgsb_problems(cfg, n)
            p = lt.LBFGSBParams(epsilon=1e-9, epsilon_rel=0.0,
                                max_iterations=400, max_linesearch=mls,
                                max_step=maxs)

            def solve(dv, bv, lbv, ubv, x):
                return lt.minimize_b(fun_and_grad=quad_fg(dv, bv), x0=x,
                                     lb=lbv, ub=ubv, params=p)
            res = jax.jit(jax.vmap(solve))(jnp.asarray(d), jnp.asarray(b),
                                           jnp.asarray(lb), jnp.asarray(ub),
                                           jnp.asarray(x0))
            for rep in range(REPS):
                ref = by_key_lfb[(cfg, rep)]
                if ref["niter"] >= 0 and int(res.niter[rep]) == ref["niter"]:
                    n_exact += 1
                else:
                    n_miss += 1
        print(f"L-BFGS-B line-search failure paths: {n_exact + n_miss} runs "
              f"— exact {n_exact}, mismatched {n_miss}")


if __name__ == "__main__":
    main()
