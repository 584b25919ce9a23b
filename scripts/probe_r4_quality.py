"""TPU probe (round 4): close the last quality daylight on both metrics.

1. Headline: diagnose the ~0.05% of instances failing the reference's
   every-run 1e-4 criterion after main+warm-polish (are they converged-
   by-gnorm at barely-epsilon, i.e. invisible to unconverged-first deep
   selection?), then measure the tightened-epsilon polish/deep config
   (polish eps << main eps makes "converged" certify the criterion).
2. Box: diagnose the x-space criterion failures (fx gate was hiding up
   to ~3e-3 of x error) — niter/status distribution — and measure a
   raised iteration cap.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/probe_r4_quality.py > /tmp/probe_r4_quality.log 2>&1 &
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, LBFGSBParams, lbfgs, lbfgsb
    from lbfgspp_tpu.batch import polish_solve, _merge_polished, deep_polish
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 256))
    dtype = jnp.float32 if on_tpu else jnp.float64
    n = 100

    params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)

    def report(tag, res, dt=None):
        xn = np.asarray(res.x, np.float64)
        err = np.max(np.abs(xn - 1.0), axis=1)
        q4 = float(np.mean(err <= 1e-4))
        st = np.asarray(res.status)
        gn = np.asarray(res.gnorm, np.float64)
        fail = err > 1e-4
        line = f"{tag}: q@1e-4={q4:.4f} nfail={fail.sum()}"
        if dt is not None:
            line += f"  {batch * REPS / dt:,.0f} solves/s"
        print(line, flush=True)
        if fail.any():
            idx = np.flatnonzero(fail)[:16]
            print("   failing: status", st[idx].tolist(),
                  "gnorm", [f"{g:.2e}" for g in gn[idx]],
                  "err", [f"{e:.2e}" for e in err[idx]], flush=True)
            # where do they rank under unconverged-first + gnorm-desc?
            unconv = (st == 3) | (st >= 10)
            rank = np.argsort(np.argsort(-gn))
            key = np.where(unconv, rank, rank + batch)
            order = np.argsort(key)
            pos = {int(i): int(p) for p, i in enumerate(order)}
            print("   selection rank of failing:",
                  [pos[int(i)] for i in idx], flush=True)
        return q4

    def timed(f, arg, tag):
        res = f(arg)
        np.asarray(res.fx)
        t0 = time.perf_counter()
        for _ in range(REPS):
            res = f(arg)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        report(tag, res, dt)
        return res

    # --- A: shipping config (diagnosis of the residual failures) ---
    pol_params = params

    def solve_one(pp):
        def inner(x0):
            res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv")
            pol = polish_solve(rosenbrock, res.x, pp, 5,
                               direction="rinv", warm_history=res.history)
            return _merge_polished(res, pol)
        return inner

    f_ship = jax.jit(lambda xs: jax.vmap(solve_one(params))(xs))
    timed(f_ship, x0s, "A ship main+warmpolish (no deep)")

    # --- B: tightened polish epsilon + deep, sweep eps ---
    for eps_pol in (1e-6, 3e-7):
        pp = dataclasses.replace(params, epsilon=eps_pol)

        def fb(xs, pp=pp):
            res = jax.vmap(solve_one(pp))(xs)
            return deep_polish(rosenbrock, res, pp, max(4, batch // 256),
                               60, direction="rinv")
        timed(jax.jit(fb), x0s, f"B polish-eps={eps_pol} + deep 16x60")

    # --- C: box x-criterion diagnosis ---
    bn = 10
    bx_star = np.tile([2.0, 4.0], bn // 2)
    lb = jnp.full((bn,), 2.0, dtype)
    ub = jnp.full((bn,), 4.0, dtype)
    bx0 = jnp.asarray(rng.uniform(2.0, 4.0, (batch, bn)), dtype)

    for cap, eps in ((60, 1e-6), (150, 1e-6), (150, 3e-7)):
        bp = LBFGSBParams(epsilon=eps, max_iterations=cap)
        sb = lbfgsb.solver(rosenbrock, lb, ub, bp, gcp="prefix")
        bsolve = jax.jit(lambda xs: jax.vmap(
            lambda x0: sb.finalize(sb.run(sb.init(x0))))(xs))
        bres = bsolve(bx0)
        np.asarray(bres.fx)
        t0 = time.perf_counter()
        for _ in range(REPS):
            bres = bsolve(bx0)
            np.asarray(bres.fx)
        dt = time.perf_counter() - t0
        bxn = np.asarray(bres.x, np.float64)
        err = np.max(np.abs(bxn - bx_star), axis=1)
        q = float(np.mean(err <= 1e-4))
        st = np.asarray(bres.status)
        ni = np.asarray(bres.niter)
        fail = err > 1e-4
        print(f"C box cap={cap} eps={eps}: frac_x@1e-4={q:.4f} "
              f"nfail={fail.sum()}  {batch * REPS / dt:,.0f} solves/s "
              f"niter p50/p100={np.percentile(ni, 50):.0f}/{ni.max()}",
              flush=True)
        if fail.any():
            idx = np.flatnonzero(fail)[:12]
            print("   failing: status", st[idx].tolist(),
                  "niter", ni[idx].tolist(),
                  "err", [f"{e:.2e}" for e in err[idx]], flush=True)


if __name__ == "__main__":
    main()
