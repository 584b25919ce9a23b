"""Seed-robustness of the shipped every-run config (round 4).

The bench fixes its start batch (seed 0); the EVERY-RUN claim should
not be seed luck.  Runs the exact shipped three-phase headline on
several disjoint 4096-start batches and reports the quality gate per
seed.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/probe_seed_robustness.py > /tmp/probe_seeds.log 2>&1 &
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished, deep_polish
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 256))
    n = 100
    dtype = jnp.float32 if on_tpu else jnp.float64

    params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16,
                         max_linesearch=4)
    pol_params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)

    def one(x0):
        res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv",
                             on_ls_fail=os.environ.get("PROBE_LSFAIL",
                                                       "stop"))
        pol = polish_solve(rosenbrock, res.x, pol_params, 5,
                           direction="rinv", warm_history=res.history)
        return _merge_polished(res, pol)

    def f(xs):
        res = jax.vmap(one)(xs)
        return deep_polish(rosenbrock, res, pol_params,
                           int(os.environ.get("PROBE_KDEEP", batch // 8)),
                           60, direction="rinv")

    fj = jax.jit(f)
    for seed in (0, 1, 2, 3, 7):
        x0s = jnp.asarray(
            np.random.default_rng(seed).uniform(-2.0, 2.0, (batch, n)),
            dtype)
        res = fj(x0s)
        xn = np.asarray(res.x, np.float64)
        err = np.max(np.abs(xn - 1.0), axis=1)
        q = float(np.mean(err <= 1e-4))
        print(f"seed={seed}: q@1e-4={q:.4f} nfail={int((err > 1e-4).sum())}"
              f" worst_err={err.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
