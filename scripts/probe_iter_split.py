"""TPU probe: per-component cost split of one batched solver iteration at
the headline config (batch 4096, n=100, m=16, f32).

Each component is scan-chained (CLAUDE.md: per-component microbenchmarks
must chain calls inside one ``lax.scan`` or they measure tunnel
overhead) with a data dependence between steps so XLA cannot elide work.
Components:

  * objective value+grad (pairwise Rosenbrock, reshape form)
  * apply_hv           (Gram-cached two-loop, m Jacobi sweeps)
  * apply_hv_doubling  (same math, log2(m) product-doubling solve)
  * update_history     (fused gate + ring write + Gram update)
  * one full solver step (init/step API) for the whole-body number

Usage:
    nohup /opt/venv/bin/python scripts/probe_iter_split.py \
        > /tmp/probe_iter.log 2>&1 &
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
CHAIN = 50   # scan length per timed call
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.ops import history as hist_ops
    from lbfgspp_tpu.utils.objectives import rosenbrock

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # A realistic mid-solve history: run 40 iterations of the real solver
    # from random starts, take its state.
    params = LBFGSParams(epsilon=1e-20, max_iterations=40, m=M)
    s = lbfgs.solver(rosenbrock, params)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (BATCH, N)), dtype)
    warm = jax.jit(jax.vmap(lambda x0: s.run(s.init(x0))))
    st = warm(x0s)
    np.asarray(st.x)  # sync

    hist = st.hist
    v0 = st.grad

    fg = jax.value_and_grad(rosenbrock)

    def timed(name, scan_fn, carry0):
        # Reduce to ONE scalar in-graph before fetching: the host<->device
        # tunnel moves ~MB/s, so syncing on a [4096, 100] carry would
        # measure transfer time, not compute.
        def reduced(c):
            out = lax.scan(scan_fn, c, None, length=CHAIN)[0]
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(out)
                       if jnp.issubdtype(l.dtype, jnp.floating))
        fn = jax.jit(reduced)
        np.asarray(fn(carry0))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            np.asarray(fn(carry0))
        dt = time.perf_counter() - t0
        us = dt / (REPS * CHAIN) * 1e6
        print(json.dumps({"component": name, "us_per_call": round(us, 1)}),
              flush=True)
        return us

    # 1. objective value+grad
    def obj_step(c, _):
        fx, g = jax.vmap(fg)(c)
        return c + 1e-12 * g + 1e-30 * fx[:, None], None
    timed("objective value+grad", obj_step, x0s)

    # 2. apply_hv (shipping path)
    def hv_step(c, _):
        d = jax.vmap(lambda h, v: hist_ops.apply_hv(h, v, -1.0))(hist, c)
        return c + 1e-12 * d, None
    timed("apply_hv (jacobi sweeps)", hv_step, v0)

    # 2b. apply_hv with the log2(m) doubling triangular solve
    def hv2_step(c, _):
        d = jax.vmap(lambda h, v: hist_ops.apply_hv(h, v, -1.0,
                                                    tri="doubling"))(hist, c)
        return c + 1e-12 * d, None
    timed("apply_hv (doubling)", hv2_step, v0)

    # 2c. apply_hv through the incremental R^{-1} (3 [m, m] matvecs)
    sr = lbfgs.solver(rosenbrock, params, direction="rinv")
    str_ = jax.jit(jax.vmap(lambda x0: sr.run(sr.init(x0))))(x0s)
    np.asarray(str_.fx)
    hist_r = str_.hist

    def hv3_step(c, _):
        d = jax.vmap(lambda h, v: hist_ops.apply_hv(h, v, -1.0,
                                                    tri="rinv"))(hist_r, c)
        return c + 1e-12 * d, None
    timed("apply_hv (rinv)", hv3_step, v0)

    # 3. update_history
    def uh_step(c, _):
        sv, yv = c
        h2, _ = jax.vmap(
            lambda h, a, b: hist_ops.update_history(
                h, a, b, jnp.ones((), bool)))(hist, sv, yv)
        return (sv + 1e-12 * h2.theta[:, None], yv), None
    timed("update_history", uh_step, (0.1 * v0, 0.1 * v0 + 1e-3))

    # 4. one full solver step (whole while-body incl. line search + cond)
    params_full = LBFGSParams(epsilon=1e-20, max_iterations=10**9, m=M)
    sf = lbfgs.solver(rosenbrock, params_full)
    st0 = jax.jit(jax.vmap(sf.init))(x0s)

    def step_step(c, _):
        return jax.vmap(sf.step)(c), None
    timed("full solver step", step_step, st0)

    # 5. full solver step, direction="rinv"
    sfr = lbfgs.solver(rosenbrock, params_full, direction="rinv")
    st0r = jax.jit(jax.vmap(sfr.init))(x0s)

    def stepr_step(c, _):
        return jax.vmap(sfr.step)(c), None
    timed("full solver step (rinv)", stepr_step, st0r)

    # 6. calibration: empty scan step (tunnel/scan floor)
    def noop_step(c, _):
        return c + 1e-12, None
    timed("noop scan step (floor)", noop_step, jnp.zeros((), dtype))


if __name__ == "__main__":
    main()
