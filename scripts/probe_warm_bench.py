"""TPU probe: warm-start polish inside the exact bench.py harness
(polish fused into the same vmapped solve_one, single jitted callable).

Usage:
    setsid nohup /opt/venv/bin/python scripts/probe_warm_bench.py \
        > /tmp/probe_warmb.log 2>&1 < /dev/null &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 4096
N = 100
M = 16
REPS = int(os.environ.get("PROBE_REPS", 5))

# (main_iters, polish_iters, warm)
CONFIGS = [
    (158, 10, False),   # shipping config, re-measured
    (158, 10, True),
    (158, 6, True),
    (158, 5, True),
    (162, 6, True),
    (158, 4, True),
]
if os.environ.get("PROBE_CONFIGS"):
    CONFIGS = [(int(a), int(b), c in ("1", "true", "True"))
               for a, b, c in (s.split(",") for s in
                               os.environ["PROBE_CONFIGS"].split(";"))]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (BATCH, N)), jnp.float32)

    for iters, polish, warm in CONFIGS:
        params = LBFGSParams(epsilon=1e-5, max_iterations=iters, m=M)

        def solve_one(x0, params=params, polish=polish, warm=warm):
            res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv")
            pol = polish_solve(rosenbrock, res.x, params, polish,
                               direction="rinv",
                               warm_history=res.history if warm else None)
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
            "iters": iters, "polish": polish, "warm": warm,
            "solves_per_s": round(BATCH * REPS / dt, 1),
            "q@1e-4": round(q4, 4),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
