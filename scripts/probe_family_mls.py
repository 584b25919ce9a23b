"""Does the batch-MAX trial-count lever (PERF.md round-4) transfer to
the other solver families?

1. Box bench config (More-Thuente, converges ~8 iterations): sweep
   max_linesearch with the x-criterion gate + active-set polish.
2. OWL-QN batched lasso (projected backtracking): sweep
   max_linesearch with the KKT/convergence gate.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/probe_family_mls.py > /tmp/probe_family_mls.log 2>&1 &
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, LBFGSBParams, lbfgsb
    from lbfgspp_tpu.batch import polish_solve_b
    from lbfgspp_tpu.owlqn import minimize_owlqn
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 128))
    dtype = jnp.float32 if on_tpu else jnp.float64
    rng = np.random.default_rng(0)

    # --- 1. box family ---
    bn = 10
    bx_star = np.tile([2.0, 4.0], bn // 2)
    lb = jnp.full((bn,), 2.0, dtype)
    ub = jnp.full((bn,), 4.0, dtype)
    bx0 = jnp.asarray(rng.uniform(2.0, 4.0, (batch, bn)), dtype)
    bpol = LBFGSParams(epsilon=1e-7, max_iterations=162, m=6)

    for mls in (20, 4, 2, 1):
        bp = LBFGSBParams(epsilon=1e-6, max_iterations=60,
                          max_linesearch=mls)
        sb = lbfgsb.solver(rosenbrock, lb, ub, bp, gcp="prefix")

        def one(x0):
            res = sb.finalize(sb.run(sb.init(x0)))
            if on_tpu:
                res = polish_solve_b(rosenbrock, res.x, lb, ub, bpol, 4)
            return res
        f = jax.jit(lambda xs: jax.vmap(one)(xs))
        res = f(bx0)
        np.asarray(res.fx)
        t0 = time.perf_counter()
        for _ in range(REPS):
            res = f(bx0)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        xn = np.asarray(res.x, np.float64)
        err = np.max(np.abs(xn - bx_star), axis=1)
        q = float(np.mean(err <= 1e-4))
        print(f"box mls={mls:2d}: {batch * REPS / dt:10,.0f} solves/s  "
              f"frac_x@1e-4={q:.4f}", flush=True)


if __name__ == "__main__":
    main()
