"""TPU probe: cost split of the shipping headline (main f32 phase vs df64
polish phase) and cheaper polish variants.

The shipping headline (bench.py) is 150 f32 main iterations (m=16) + 12
df64 pair-polish iterations with the Moré-Thuente search.  A df64
objective evaluation costs ~5-10x an f32 one (error-free-transform pair
arithmetic), so the 12 polish iterations are a candidate throughput
sink.  This probe measures, at the shipping batch/config:

  1. main only (the polish share by subtraction),
  2. the shipping polish (MT, m=16),
  3. polish with the cheaper line searches (backtracking, nocedalwright),
  4. polish with a small history (m=4 — the polish history restarts from
     empty anyway, so a large m only pays carry cost for slots that are
     never filled in 12 iterations).

One process, sequential configs (remote compiles serialize through the
tunnel), fetch-synced timing, single jitted callable per config.

Usage:
    nohup /opt/venv/bin/python scripts/probe_polish_split.py \
        > /tmp/probe_polish.log 2>&1 &
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
M_MAIN = 16
ITERS = 150
REPS = 3

# (tag, polish_iters, polish_line_search, polish_m)
CONFIGS = [
    ("main-only", 0, None, None),
    ("ship: mt m=16 p12", 12, "morethuente", 16),
    ("bt m=16 p12", 12, "backtracking", 16),
    ("nw m=16 p12", 12, "nocedalwright", 16),
    ("mt m=4 p12", 12, "morethuente", 4),
    ("bt m=4 p12", 12, "backtracking", 4),
]


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (BATCH, N)), dtype)
    params = LBFGSParams(epsilon=1e-5, max_iterations=ITERS, m=M_MAIN)

    for tag, polish, ls, pm in CONFIGS:
        def solve_one(x0, polish=polish, ls=ls, pm=pm):
            res = lbfgs.minimize(rosenbrock, x0, params)
            if polish:
                pparams = (params if pm == M_MAIN
                           else dataclasses.replace(params, m=pm))
                pol = polish_solve(rosenbrock, res.x, pparams, polish,
                                   line_search=ls)
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
        q3 = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-3))
        print(json.dumps({
            "tag": tag,
            "solves_per_s": round(BATCH * REPS / dt, 1),
            "q@1e-4": round(q4, 4),
            "q@1e-3": round(q3, 4),
            "compile_s": round(compile_s, 1),
            "run_s_per_rep": round(dt / REPS, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
