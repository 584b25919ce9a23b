"""TPU probe: batch-minor (feature-major) layout for vmapped solves.

Hypothesis: the batched headline is latency/occupancy-bound (PERF.md,
ops/fused.py header) with [B, n] intermediates — n rides the 128-lane
axis at n/128 utilization (78% at n=100; 7.8%!! at the box bench's
n=10).  vmapping with ``in_axes=1`` over [n, B] starts keeps the batch
dimension minor, so elementwise ops and reductions over n run at full
lane utilization (B = 4096 is a multiple of 128).

Measures the shipping bench configs both ways:
  * headline: Rosenbrock n=100, m=16, rinv, 162 it + warm df64 polish 5
  * box:      Rosenbrock n=10 in [2, 4]^n, eps=1e-6, prefix GCP

Usage:
    cd /root/repo && nohup /opt/venv/bin/python scripts/probe_layout.py \
        > /tmp/probe_layout.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, LBFGSBParams, lbfgs, lbfgsb
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 128))
    dtype = jnp.float32 if on_tpu else jnp.float64
    n = 100

    params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)
    polish_iters = 5

    def solve_one(x0):
        res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv")
        # Mirror bench.py: the df64 polish ships only on TPU, so a CPU
        # probe run must measure the same phase structure the bench does
        # per backend (df64-pair arithmetic on an f64 backend is a
        # configuration the bench never runs).
        if on_tpu:
            pol = polish_solve(rosenbrock, res.x, params, polish_iters,
                               direction="rinv", warm_history=res.history)
            res = _merge_polished(res, pol)
        return res

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)

    def layout_report(f, arg, tag):
        """Count the dominant intermediate orientations in the OPTIMIZED
        HLO (``.compile().as_text()`` — post-layout/fusion, printed in HLO
        text shape syntax ``f32[4096,100]``; the pre-compile ``.lower()``
        text is StableHLO MLIR whose ``tensor<4096x100xf32>`` syntax the
        old counts silently missed).  The element-type token follows the
        probe's actual dtype (f64 on CPU)."""
        txt = jax.jit(f).lower(arg).compile().as_text()
        dt = "f32" if dtype == jnp.float32 else "f64"
        bm = txt.count(f"{dt}[{batch},{n}]")
        fm = txt.count(f"{dt}[{n},{batch}]")
        print(f"{tag}: HLO [B,n] sites={bm}  [n,B] sites={fm}", flush=True)

    def timed(f, arg, tag):
        res = f(arg)
        np.asarray(res.fx)                       # compile + sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            res = f(arg)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        xn = np.asarray(res.x, np.float64)
        q = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
        print(f"{tag}: {batch * REPS / dt:,.0f} solves/s  q@1e-4={q:.4f}",
              flush=True)
        return batch * REPS / dt

    # --- headline, batch-major (shipping layout) ---
    f_bm = jax.vmap(solve_one, in_axes=0)
    layout_report(f_bm, x0s, "headline in_axes=0")
    timed(jax.jit(f_bm), x0s, "headline [B, n] (in_axes=0)")

    # --- headline, feature-major (outputs transposed back at the end) ---
    f_fm = jax.vmap(solve_one, in_axes=1)
    layout_report(f_fm, x0s.T, "headline in_axes=1")
    timed(jax.jit(f_fm), x0s.T, "headline [n, B] (in_axes=1)")

    # --- box, both layouts ---
    bn = 10
    bparams = LBFGSBParams(epsilon=1e-6, max_iterations=60)
    lb = jnp.full((bn,), 2.0, dtype)
    ub = jnp.full((bn,), 4.0, dtype)
    sb = lbfgsb.solver(rosenbrock, lb, ub, bparams, gcp="prefix")

    def bsolve_one(x0):
        return sb.finalize(sb.run(sb.init(x0)))

    bx0 = jnp.asarray(rng.uniform(2.0, 4.0, (batch, bn)), dtype)

    def btimed(f, arg, tag):
        res = f(arg)
        np.asarray(res.fx)
        t0 = time.perf_counter()
        for _ in range(REPS):
            res = f(arg)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        bfx = np.asarray(res.fx, np.float64)
        frac = float(np.mean(bfx <= 5.0 + 1e-3))
        print(f"{tag}: {batch * REPS / dt:,.0f} solves/s  "
              f"frac_optimal={frac:.4f}", flush=True)

    btimed(jax.jit(jax.vmap(bsolve_one, in_axes=0)), bx0,
           "box [B, n] (in_axes=0)")
    btimed(jax.jit(jax.vmap(bsolve_one, in_axes=1)), bx0.T,
           "box [n, B] (in_axes=1)")


if __name__ == "__main__":
    main()
