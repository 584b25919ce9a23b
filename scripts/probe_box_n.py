"""TPU probe: batched box throughput vs n for the prefix GCP (cumsum
rewrite) against the sequential scan walk.

One JSON line per (n, gcp, batch) config.

    nohup /opt/venv/bin/python scripts/probe_box_n.py > /tmp/boxn.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # (n, batch, gcp)
    (10, 4096, "prefix"),     # shipped bench config (regression check)
    (256, 512, "prefix"),
    (256, 512, "scan"),
    (1024, 128, "prefix"),
    (1024, 128, "scan"),
    (2048, 64, "prefix"),
]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSBParams
    from lbfgspp_tpu.batch import minimize_b_batched

    reps = 3
    rng = np.random.default_rng(0)

    def cr(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    for n, batch, gcp in CONFIGS:
        params = LBFGSBParams(epsilon=1e-6, max_iterations=60)
        lb = jnp.full((n,), 2.0, jnp.float32)
        ub = jnp.full((n,), 4.0, jnp.float32)
        solve = jax.jit(lambda xs, gcp=gcp, lb=lb, ub=ub, params=params:
                        minimize_b_batched(cr, xs, lb, ub, params,
                                           gcp=gcp, jit=False))
        x0s = jnp.asarray(rng.uniform(2.0, 4.0, (batch, n)), jnp.float32)
        t0 = time.perf_counter()
        res = solve(x0s)
        np.asarray(res.fx)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            res = solve(x0s)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        fx = np.asarray(res.fx, np.float64)
        # constrained optimum of chained Rosenbrock on [2,4]^n:
        # all coords at 2 -> f = (n-1)*(100*4 + 1)
        fstar = (n - 1) * (100.0 * (2.0 - 4.0) ** 2 + 1.0)
        ok = float(np.mean(np.isfinite(fx)))
        print(json.dumps({
            "n": n, "batch": batch, "gcp": gcp,
            "solves_per_s": round(batch * reps / dt, 1),
            "p50_niter": int(np.median(np.asarray(res.niter))),
            "finite_frac": ok,
            "fx_med_over_fstar": round(float(np.median(fx)) / fstar, 4),
            "compile_s": round(compile_s, 1), "run_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
