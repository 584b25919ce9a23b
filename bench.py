"""Benchmark: batched Rosenbrock n=100 L-BFGS solves per second per chip.

The BASELINE.json north-star metric: >= 10^4 batched Rosenbrock n=100
solves/s/chip via one vmapped, jitted solve (the reference's analog is a
*sequential* 1024-start loop, examples/example-rosenbrock-comparison.cpp:64).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 1e4 (the target solves/s).

Runs on the default backend (TPU via axon when available, CPU otherwise);
everything is jitted — nothing eager touches the device.  Batch size and
repetitions are tunable via BENCH_BATCH / BENCH_REPS env vars.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, minimize
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("BENCH_BATCH", 8192 if on_tpu else 512))
    reps = int(os.environ.get("BENCH_REPS", 5 if on_tpu else 2))
    n = 100
    dtype = jnp.float32 if on_tpu else jnp.float64

    # Reference-comparable solve settings: converge to epsilon=1e-5 like the
    # reference defaults; the iteration envelope bounds the batch critical
    # path (a batch runs as long as its slowest instance).
    params = LBFGSParams(epsilon=1e-5, max_iterations=200, max_linesearch=60)

    def solve_batch(x0s):
        res = jax.vmap(lambda x0: minimize(rosenbrock, x0, params))(x0s)
        return res.fx, res.niter, res.status

    solve = jax.jit(solve_batch)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)

    # Warm-up / compile
    fx, niter, status = solve(x0s)
    jax.block_until_ready(fx)

    t0 = time.perf_counter()
    for i in range(reps):
        xi = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)
        fx, niter, status = solve(xi)
        jax.block_until_ready(fx)
    dt = time.perf_counter() - t0

    solves_per_s = batch * reps / dt
    # Sanity: solved fraction (status 1/2 = converged; 3 = iteration cap)
    ok = float(np.mean(np.isin(np.asarray(status), (1, 2))))

    print(json.dumps({
        "metric": f"batched Rosenbrock n={n} L-BFGS solves/s/chip "
                  f"(batch={batch}, backend={backend}, "
                  f"converged_frac={ok:.3f})",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1e4, 4),
    }))


if __name__ == "__main__":
    main()
