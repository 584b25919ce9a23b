"""Does the shipped every-run RECIPE transfer beyond Rosenbrock?
(VERDICT r4 task 5.)

The bench headline certifies its quality with a specific recipe —
trial-capped main phase (``max_linesearch=2`` + ``on_ls_fail="restart"``,
m=16, 162 it, rinv) + 5 warm df64 polish iterations at the full trial
budget + ``deep_polish`` with k_deep = 3*batch/16 x 60 — but round 4
only certified it on the Rosenbrock family.  This probe runs the EXACT
recipe, tuning nothing, on two other batched families at their own
acceptance criteria, >= 3 seeds each:

- the fuzz suite's separable convex QUARTICS
  (f = sum c_i e^4 + 0.5 d_i e^2, e = x - t; ref_fuzz.cpp:52-67):
  closed-form optimum x* = t, criterion max|x - t| <= 1e-4;
- batched dense LOGISTIC REGRESSION (rows x n, one instance's data per
  batch lane from its seed, all under float32 matmul precision per the
  PERF.md OWL-QN finding): criterion ||g||_inf <= 1e-4 at the result
  (strictly convex => gradient certifies the optimum).

The claim under test is that the RULE transfers, not the numbers.

Usage:
    nohup /opt/venv/bin/python \
        scripts/probe_recipe_families.py > /tmp/recipe_families.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished, deep_polish

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 256))
    seeds = (0, 1, 2)

    # the EXACT shipped recipe (bench.py)
    params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16,
                         max_linesearch=2)
    pol_params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)
    polish_iters, deep_iters = 5, 60
    k_deep = max(4, 3 * batch // 16)

    def run_recipe(fun, x0s, capped=True):
        mp = params if capped else LBFGSParams(
            epsilon=1e-5, max_iterations=162, m=16)

        def solve_one(x0):
            res = lbfgs.minimize(fun, x0, mp, direction="rinv",
                                 on_ls_fail="restart" if capped else "stop")
            pol = polish_solve(fun, res.x, pol_params, polish_iters,
                               direction="rinv", warm_history=res.history)
            return _merge_polished(res, pol)

        def solve_batch(xs):
            res = jax.vmap(solve_one)(xs)
            return deep_polish(fun, res, pol_params, k_deep, deep_iters,
                               direction="rinv")

        f = jax.jit(solve_batch)
        res = f(x0s)
        np.asarray(res.fx)               # sync (compile + warm)
        t0 = time.perf_counter()
        res = f(x0s)
        np.asarray(res.fx)
        dt = time.perf_counter() - t0
        return res, batch / dt

    def diag(res):
        st = np.asarray(res.status)
        ni = np.asarray(res.niter)
        vals, cnt = np.unique(st, return_counts=True)
        return (f"status {dict(zip(vals.tolist(), cnt.tolist()))} "
                f"niter p50/p90 {int(np.percentile(ni, 50))}/"
                f"{int(np.percentile(ni, 90))}")

    # ---------- family 1: separable convex quartics ----------
    n = 100
    for seed in seeds:
        rng = np.random.default_rng(100 + seed)
        c = jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32)
        d = jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32)
        t = jnp.asarray(rng.uniform(-1.0, 1.0, n), jnp.float32)

        def quartic(x):
            e = x - t
            e2 = e * e
            return jnp.sum(c * e2 * e2 + 0.5 * d * e2)

        x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), jnp.float32)
        for capped in (True, False):
            res, sps = run_recipe(quartic, x0s, capped)
            err = np.max(np.abs(np.asarray(res.x, np.float64) -
                                np.asarray(t, np.float64)), axis=1)
            frac = float(np.mean(err <= 1e-4))
            print(f"quartic seed={seed} "
                  f"{'shipped' if capped else 'ref-budget'}: "
                  f"frac@1e-4 = {frac:.4f} (worst {err.max():.2e}), "
                  f"{sps:.0f} solves/s, {diag(res)}", flush=True)

    # ---------- family 2: batched dense logistic regression ----------
    rows, nl = 64, 32
    for lam in (0.1, 1e-3):          # ridge => strictly convex; lam sets
        for seed in seeds:           # the conditioning (kappa ~ 1/lam)
            rng = np.random.default_rng(200 + seed)
            a = jnp.asarray(rng.normal(size=(rows, nl)) / np.sqrt(nl),
                            jnp.float32)
            b = jnp.asarray(np.sign(rng.normal(size=rows)), jnp.float32)

            def logreg(w):
                z = -b * (a @ w)
                return (jnp.sum(jnp.logaddexp(0.0, z))
                        + 0.5 * lam * jnp.dot(w, w))

            def logreg_p(w):
                with jax.default_matmul_precision("float32"):
                    return logreg(w)

            x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, nl)),
                              jnp.float32)
            for capped in (True, False):
                res, sps = run_recipe(logreg_p, x0s, capped)
                a64 = np.asarray(a, np.float64)
                b64 = np.asarray(b, np.float64)
                x64 = np.asarray(res.x, np.float64)
                z = -b64 * (x64 @ a64.T)
                dl = -b64 / (1.0 + np.exp(-z))
                g = dl @ a64 + lam * x64
                gi = np.max(np.abs(g), axis=1)
                frac = float(np.mean(gi <= 1e-4))
                spread = np.max(np.abs(x64 - np.median(x64, axis=0)))
                print(f"logreg lam={lam} seed={seed} "
                      f"{'shipped' if capped else 'ref-budget'}: "
                      f"frac(|g|inf<=1e-4) = {frac:.4f} "
                      f"(worst {gi.max():.2e}), x-spread {spread:.2e}, "
                      f"{sps:.0f} solves/s, {diag(res)}", flush=True)


if __name__ == "__main__":
    main()
