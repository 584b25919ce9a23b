"""TPU probe: while_loop vs fixed-trip fori_loop drive at the shipping
headline config (batch 4096, m=16, 150 it + 12 polish).

One JSON line per variant.  Run from anywhere:

    nohup /opt/venv/bin/python scripts/probe_drive.py > /tmp/drive.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams
    from lbfgspp_tpu.batch import minimize_batched

    n, batch, reps = 100, 4096, 3
    params = LBFGSParams(epsilon=1e-5, max_iterations=150, m=16)
    from lbfgspp_tpu.utils.objectives import rosenbrock
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), jnp.float32)

    for drive in ("while", "fixed"):
        solve = jax.jit(lambda xs, drive=drive: minimize_batched(
            rosenbrock, xs, params, polish_iters=12, jit=False,
            drive=drive))
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
            "drive": drive,
            "solves_per_s": round(batch * reps / dt, 1),
            "q@1e-4": round(q4, 4),
            "compile_s": round(compile_s, 1), "run_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
