"""TPU probe for bench.py headline configs: (batch, m, iters, polish).

Runs a list of candidate headline configurations sequentially in ONE
process (remote compiles serialize through the tunnel; never run two TPU
processes at once), printing one JSON line per config.  Sync points are
device-to-host fetches (this backend's block_until_ready acks dispatch
without awaiting execution).

Usage (from the repo root, default backend = TPU via axon):

    nohup /opt/venv/bin/python scripts/bench_probe.py > /tmp/probe.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # (batch, m, iters, polish)
    # thin main phase (140 measured 24.6k at polish 12 but only 0.9922
    # @1e-4); can extra df64 polish recover the quality margin cheaply?
    (4096, 16, 140, 18),
    (4096, 16, 140, 24),
    (4096, 16, 135, 24),
]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    n = 100
    dtype = jnp.float32
    reps = 3
    rng = np.random.default_rng(0)

    for batch, m, iters, polish in CONFIGS:
        params = LBFGSParams(epsilon=1e-5, max_iterations=iters, m=m)

        def solve_one(x0, params=params, polish=polish):
            res = lbfgs.minimize(rosenbrock, x0, params)
            pol = polish_solve(rosenbrock, res.x, params, polish)
            return _merge_polished(res, pol)

        solve = jax.jit(lambda xs: jax.vmap(solve_one)(xs))
        x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)

        t0 = time.perf_counter()
        res = solve(x0s)
        np.asarray(res.fx)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(reps):
            res = solve(x0s)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        xn = np.asarray(res.x, np.float64)
        q4 = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
        q3 = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-3))
        print(json.dumps({
            "batch": batch, "m": m, "iters": iters, "polish": polish,
            "solves_per_s": round(batch * reps / dt, 1),
            "q@1e-4": round(q4, 4), "q@1e-3": round(q3, 4),
            "compile_s": round(compile_s, 1), "run_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
