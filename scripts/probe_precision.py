"""Does matmul precision move the bench headline?

TPU f32 matmuls default to bf16 passes; the two-loop's [2m, n] history
products therefore carry reduced-precision directions.  This probe sweeps
matmul precision x main-phase iterations at the shipping headline config
(batch 4096, m=16, polish 12) to see whether float32-precision directions
converge in fewer iterations (a throughput win) or change quality.

Usage:
    nohup /opt/venv/bin/python scripts/probe_precision.py \
        > /tmp/probe_precision.log 2>&1 &
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # (precision or None for backend default, iters, polish)
    (None, 150, 12),        # shipping config (control)
    ("float32", 150, 12),
    ("float32", 130, 12),
    ("float32", 120, 12),
    (None, 130, 12),
]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    n, batch, m, reps = 100, 4096, 16, 3
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), jnp.float32)

    for prec, iters, polish in CONFIGS:
        params = LBFGSParams(epsilon=1e-5, max_iterations=iters, m=m)

        def solve_one(x0, params=params, polish=polish):
            res = lbfgs.minimize(rosenbrock, x0, params)
            pol = polish_solve(rosenbrock, res.x, params, polish)
            return _merge_polished(res, pol)

        ctx = (jax.default_matmul_precision(prec) if prec
               else contextlib.nullcontext())
        with ctx:
            solve = jax.jit(lambda xs: jax.vmap(solve_one)(xs))
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
        print(json.dumps({
            "precision": prec or "default", "iters": iters,
            "polish": polish,
            "solves_per_s": round(batch * reps / dt, 1),
            "q@1e-4": round(q4, 4),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
