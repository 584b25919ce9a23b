"""TPU probe: warm-start df64 polish (inherit the main phase's curvature
history, lifted into pair space) vs the cold-restart polish, at the
shipping headline config (m=16, rinv direction, batch 4096).

A cold polish spends its first iterations rebuilding the Hessian model
from a steepest-descent restart; the warm polish starts from the full
model (first direction -H g, unit step), so the same quality should
need fewer df64 iterations — the df64 evaluation is the expensive part.

Usage:
    setsid nohup /opt/venv/bin/python scripts/probe_warm_polish.py \
        > /tmp/probe_warm.log 2>&1 < /dev/null &
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
ITERS = 158
REPS = int(os.environ.get("PROBE_REPS", 5))

# (polish_iters, warm)
CONFIGS = [
    (10, False),   # shipping config
    (10, True),
    (8, True),
    (6, True),
    (5, True),
    (4, True),
]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams
    from lbfgspp_tpu.batch import minimize_batched
    from lbfgspp_tpu.utils.objectives import rosenbrock

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (BATCH, N)), jnp.float32)
    params = LBFGSParams(epsilon=1e-5, max_iterations=ITERS, m=M)

    for polish, warm in CONFIGS:
        solve = jax.jit(lambda xs, polish=polish, warm=warm: minimize_batched(
            rosenbrock, xs, params, jit=False, polish_iters=polish,
            polish_warm=warm, direction="rinv"))
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
            "polish": polish, "warm": warm,
            "solves_per_s": round(BATCH * REPS / dt, 1),
            "q@1e-4": round(q4, 4),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
