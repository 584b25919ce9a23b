"""TPU probe: headline A/B of the two-loop direction schedule
(direction="sweeps" vs "rinv") at the shipping bench config
(batch 4096, n=100, m=16, 150 it + df64 polish 12).

Usage:
    nohup /opt/venv/bin/python scripts/probe_direction.py \
        > /tmp/probe_dir.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4096
N = 100
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (BATCH, N)), dtype)
    params = LBFGSParams(epsilon=1e-5, max_iterations=150, m=16)

    for direction in ("sweeps", "rinv"):
        for polish in (12, 0):
            def solve_one(x0, polish=polish, direction=direction):
                res = lbfgs.minimize(rosenbrock, x0, params,
                                     direction=direction)
                if polish:
                    pol = polish_solve(rosenbrock, res.x, params, polish)
                    res = _merge_polished(res, pol)
                return res

            solve = jax.jit(lambda xs: jax.vmap(solve_one)(xs))
            t0 = time.perf_counter()
            res = solve(x0s)
            np.asarray(res.fx)
            compile_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            for _ in range(REPS):
                res = solve(x0s)
                np.asarray(res.fx)
            dt = time.perf_counter() - t0

            xn = np.asarray(res.x, np.float64)
            q4 = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
            print(json.dumps({
                "direction": direction, "polish": polish,
                "solves_per_s": round(BATCH * REPS / dt, 1),
                "q@1e-4": round(q4, 4),
                "compile_s": round(compile_s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
