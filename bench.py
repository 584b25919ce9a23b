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
    batch = int(os.environ.get("BENCH_BATCH", 4096 if on_tpu else 512))
    reps = int(os.environ.get("BENCH_REPS", 3 if on_tpu else 2))
    n = 100
    dtype = jnp.float32 if on_tpu else jnp.float64

    # Reference-default solve settings (eps=1e-5, max_linesearch=20); the
    # iteration envelope bounds the batch critical path (a batch runs as
    # long as its slowest instance).
    params = LBFGSParams(epsilon=1e-5, max_iterations=200)

    def solve_batch(x0s):
        res = jax.vmap(lambda x0: minimize(rosenbrock, x0, params))(x0s)
        return res.fx, res.niter, res.status, res.x

    solve = jax.jit(solve_batch)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)

    # Warm-up / compile.  NOTE: on the remote-TPU (axon) backend
    # block_until_ready acks dispatch without awaiting execution, so a
    # device-to-host fetch is the only reliable sync point.
    fx, niter, status, x = solve(x0s)
    np.asarray(fx)

    t0 = time.perf_counter()
    for i in range(reps):
        xi = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)
        fx, niter, status, x = solve(xi)
        np.asarray(fx)
    dt = time.perf_counter() - t0

    solves_per_s = batch * reps / dt
    # Solution quality: the reference's own multistart acceptance criterion
    # max|x_i - 1| <= 1e-4 (example-rosenbrock-bracketing.cpp:50-54); in f32
    # the gradient-norm test saturates at the rounding floor, so instances
    # run to the iteration cap while the solution is already at f32 accuracy.
    xn = np.asarray(x)
    solved = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
    near = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-3))

    print(json.dumps({
        "metric": f"batched Rosenbrock n={n} L-BFGS solves/s/chip "
                  f"(batch={batch}, backend={backend}, "
                  f"frac_x_within_1e-4={solved:.3f}, within_1e-3={near:.3f})",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1e4, 4),
    }))


if __name__ == "__main__":
    main()
