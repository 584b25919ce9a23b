"""TPU probe: re-tune the headline (m, main iters, polish iters) frontier
under direction="rinv" (both phases), where the per-iteration O(m^2) cost
is three [m, m] matvecs instead of 2m sweeps — larger histories may now
pay where they didn't under sweeps (PERF.md round-2 frontier).

Usage:
    nohup /opt/venv/bin/python scripts/probe_rinv_tune.py \
        > /tmp/probe_rtune.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4096
N = 100
REPS = int(os.environ.get("PROBE_REPS", 3))

# (m, main_iters, polish_iters)
CONFIGS = [
    (16, 150, 12),   # shipped headline config, direction flipped to rinv
    (16, 158, 12),
    (16, 162, 12),
    (16, 158, 10),
    (24, 130, 12),   # larger history: iterations drop, rinv keeps O(m^2) cheap
    (32, 115, 12),
]
if os.environ.get("PROBE_CONFIGS"):
    CONFIGS = [tuple(map(int, c.split(",")))
               for c in os.environ["PROBE_CONFIGS"].split(";")]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (BATCH, N)), dtype)

    for m, iters, polish in CONFIGS:
        params = LBFGSParams(epsilon=1e-5, max_iterations=iters, m=m)

        def solve_one(x0, params=params, polish=polish):
            res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv")
            pol = polish_solve(rosenbrock, res.x, params, polish,
                               direction="rinv")
            return _merge_polished(res, pol)

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
            "m": m, "iters": iters, "polish": polish,
            "solves_per_s": round(BATCH * REPS / dt, 1),
            "q@1e-4": round(q4, 4),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
