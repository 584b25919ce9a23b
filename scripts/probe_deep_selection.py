"""TPU probe: deep-stage selection fidelity at the cheap-main config.

With main max_linesearch=2 (+23% throughput) the criterion failures no
longer rank inside k_deep=512 by the unconverged-first/gnorm key.  This
probe ranks them under both candidate keys on real hardware:

  * gnorm (current deep_polish key)
  * quasi-Newton step length ||H g|| from the carried history — the
    Newton estimate of distance-to-optimum

and measures the retuned config end-to-end with hstep selection.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/probe_deep_selection.py > /tmp/probe_deep_sel.log 2>&1 &
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
    from lbfgspp_tpu.ops import history as hist_ops
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 256))
    n = 100
    dtype = jnp.float32 if on_tpu else jnp.float64

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)
    params = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16,
                         max_linesearch=2)
    pparams = LBFGSParams(epsilon=1e-5, max_iterations=162, m=16)

    def one(x0):
        res = lbfgs.minimize(rosenbrock, x0, params, direction="rinv")
        pol = polish_solve(rosenbrock, res.x, pparams, 5, direction="rinv",
                           warm_history=res.history)
        return _merge_polished(res, pol)

    def with_est(xs):
        res = jax.vmap(one)(xs)
        est = jax.vmap(lambda h, g: jnp.linalg.norm(
            hist_ops.apply_hv(h, g, -1.0, tri="rinv")))(res.history,
                                                        res.grad)
        return res, est

    res, est = jax.jit(with_est)(x0s)
    xn = np.asarray(res.x, np.float64)
    err = np.max(np.abs(xn - 1.0), axis=1)
    fail = err > 1e-4
    gn = np.asarray(res.gnorm, np.float64)
    est = np.asarray(est, np.float64)
    st = np.asarray(res.status)
    unconv = (st == 3) | (st >= 10)
    print(f"mls=2 main+full polish: nfail={fail.sum()} "
          f"unconv={unconv.sum()}", flush=True)
    if fail.any():
        rank_g = np.argsort(np.argsort(-np.where(np.isnan(gn), np.inf,
                                                 gn)))
        key_g = np.where(unconv, rank_g, rank_g + batch)
        pos_g = np.argsort(np.argsort(key_g))
        rank_h = np.argsort(np.argsort(-np.where(np.isnan(est), np.inf,
                                                 est)))
        print("  gnorm-key ranks of failing:",
              sorted(pos_g[fail])[:20], flush=True)
        print("  hstep ranks of failing:",
              sorted(rank_h[fail])[:20], flush=True)
        print("  failing err:", [f"{e:.1e}" for e in err[fail][:12]],
              flush=True)
        print("  failing est:", [f"{e:.1e}" for e in est[fail][:12]],
              flush=True)

    # end-to-end with hstep selection, a couple of k values
    for k_deep, deep_it in ((512, 60), (256, 60)):
        def f(xs, k=k_deep, di=deep_it):
            res = jax.vmap(one)(xs)
            return deep_polish(rosenbrock, res, pparams, k, di,
                               direction="rinv", selection="hstep")
        fj = jax.jit(f)
        out = fj(x0s)
        np.asarray(out.fx)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fj(x0s)
            np.asarray(out.fx)
        dt = time.perf_counter() - t0
        xo = np.asarray(out.x, np.float64)
        q = float(np.mean(np.max(np.abs(xo - 1.0), axis=1) <= 1e-4))
        print(f"mls=2 + hstep deep k={k_deep}x{deep_it}: "
              f"{batch * REPS / dt:10,.0f} solves/s  q@1e-4={q:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
