"""Diagnose the cross-seed failures of the shipped config (round 4).

For seeds where the every-run gate fails: which phase produced the bad
iterate (main / polish / deep), what status/gnorm/rank the failing
instances carry, and whether a NaN appears mid-pipeline.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/probe_seed_diag.py > /tmp/probe_seed_diag.log 2>&1 &
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

    def staged(xs):
        main = jax.vmap(lambda x0: lbfgs.minimize(
            rosenbrock, x0, params, direction="rinv"))(xs)
        pol = jax.vmap(lambda xf, h: polish_solve(
            rosenbrock, xf, pol_params, 5, direction="rinv",
            warm_history=h))(main.x, main.history)
        merged = _merge_polished(main, pol)
        deep = deep_polish(rosenbrock, merged, pol_params, batch // 8, 60,
                           direction="rinv")
        return main, merged, deep

    fj = jax.jit(staged)
    for seed in (1, 2, 3, 7):
        xs = jnp.asarray(
            np.random.default_rng(seed).uniform(-2.0, 2.0, (batch, n)),
            dtype)
        main, merged, deep = fj(xs)
        xd = np.asarray(deep.x, np.float64)
        err = np.max(np.abs(xd - 1.0), axis=1)
        err = np.where(np.isnan(err), np.inf, err)
        fail = np.flatnonzero(err > 1e-4)
        print(f"seed={seed}: nfail={fail.size}", flush=True)
        xm = np.asarray(main.x, np.float64)
        xp = np.asarray(merged.x, np.float64)
        gn = np.asarray(merged.gnorm, np.float64)
        st = np.asarray(merged.status)
        unconv = (st == 3) | (st >= 10)
        rank_g = np.argsort(np.argsort(-np.where(np.isnan(gn), np.inf, gn)))
        key = np.where(unconv, rank_g, rank_g + batch)
        pos = np.argsort(np.argsort(key))
        moved = np.any(np.asarray(deep.x) != np.asarray(merged.x), axis=1)
        for i in fail[:6]:
            e_main = np.max(np.abs(xm[i] - 1.0))
            e_pol = np.max(np.abs(xp[i] - 1.0))
            print(f"  idx {i}: err main={e_main:.2e} polish={e_pol:.2e} "
                  f"final={err[i]:.2e}  main_st={int(np.asarray(main.status)[i])} "
                  f"merged_st={st[i]} deep_st={int(np.asarray(deep.status)[i])} "
                  f"gnorm={gn[i]:.2e} sel_rank={pos[i]} "
                  f"deep_moved={bool(moved[i])} "
                  f"nan_main={bool(np.isnan(xm[i]).any())} "
                  f"nan_pol={bool(np.isnan(xp[i]).any())}", flush=True)


if __name__ == "__main__":
    main()
