"""Round-4 late sweep: does on_ls_fail="restart" unlock the lower trial
caps?

The mls<4 breakage was instances whose capped search FAILED mid-valley
and idled (PERF.md round-4 frontier) — exactly what the restart fixes.
Sweep (mls, main_it) with restart + k_deep=768 and verify the every-run
gate on THREE seeds each (throughput timed on seed 0).

Usage:
    cd /root/repo && nohup /opt/venv/bin/python scripts/probe_r4_tune4.py \
        > /tmp/probe_r4_tune4.log 2>&1 &
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

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished, deep_polish
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 128))
    n = 100
    dtype = jnp.float32 if on_tpu else jnp.float64

    def build(mls, main_it, pol_it=5, k_deep=768, deep_it=60):
        params = LBFGSParams(epsilon=1e-5, max_iterations=main_it, m=16,
                             max_linesearch=mls)
        pparams = LBFGSParams(epsilon=1e-5, max_iterations=main_it, m=16)

        def one(x0):
            res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv",
                                 on_ls_fail="restart")
            pol = polish_solve(rosenbrock, res.x, pparams, pol_it,
                               direction="rinv", warm_history=res.history)
            return _merge_polished(res, pol)

        def f(xs):
            res = jax.vmap(one)(xs)
            return deep_polish(rosenbrock, res, pparams, k_deep, deep_it,
                               direction="rinv")
        return jax.jit(f)

    import ast
    grid = ast.literal_eval(os.environ.get(
        "TUNE4_GRID", "[(2, 162), (2, 150), (3, 150), (3, 162)]"))
    seeds = ast.literal_eval(os.environ.get("TUNE4_SEEDS", "(0, 1, 2)"))
    for cfg in grid:
        mls, main_it = cfg[0], cfg[1]
        pol_it = cfg[2] if len(cfg) > 2 else 5
        f = build(mls, main_it, pol_it=pol_it)
        line = f"mls={mls} main={main_it} pol={pol_it} restart k=768:"
        for seed in seeds:
            x0s = jnp.asarray(np.random.default_rng(seed).uniform(
                -2.0, 2.0, (batch, n)), dtype)
            res = f(x0s)
            np.asarray(res.fx)
            if seed == 0:
                t0 = time.perf_counter()
                for _ in range(REPS):
                    res = f(x0s)
                    np.asarray(res.fx)
                dt = time.perf_counter() - t0
                line += f" {batch * REPS / dt:10,.0f} solves/s"
            xn = np.asarray(res.x, np.float64)
            err = np.max(np.abs(xn - 1.0), axis=1)
            err = np.where(np.isnan(err), np.inf, err)
            line += f"  s{seed}:q={float(np.mean(err <= 1e-4)):.4f}" \
                    f"/{int((err > 1e-4).sum())}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
