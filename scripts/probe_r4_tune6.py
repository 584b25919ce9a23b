"""Round-4 late sweep: re-tune the history size under the shipped
recipe (mls=2 + restart + warm polish + deep).

The m=16 frontier was measured under the full-trial-budget line search
(round 2); the trial cap changed the per-iteration cost mix, so re-check
neighboring (m, main_it) cells.  Quality gate verified on three seeds.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python scripts/probe_r4_tune6.py \
        > /tmp/probe_r4_tune6.log 2>&1 &
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

    def build(m, main_it, pol_it):
        params = LBFGSParams(epsilon=1e-5, max_iterations=main_it, m=m,
                             max_linesearch=2)
        pparams = LBFGSParams(epsilon=1e-5, max_iterations=main_it, m=m)

        def one(x0):
            res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv",
                                 on_ls_fail="restart")
            pol = polish_solve(rosenbrock, res.x, pparams, pol_it,
                               direction="rinv", warm_history=res.history)
            return _merge_polished(res, pol)

        def f(xs):
            res = jax.vmap(one)(xs)
            return deep_polish(rosenbrock, res, pparams, 768, 60,
                               direction="rinv")
        return jax.jit(f)

    grid = [
        (16, 162, 5),      # shipped
        (14, 178, 5),
        (12, 192, 5),
        (16, 162, 4),
    ]
    for m, main_it, pol_it in grid:
        f = build(m, main_it, pol_it)
        line = f"m={m} main={main_it} pol={pol_it}:"
        for seed in (0, 1, 2):
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
