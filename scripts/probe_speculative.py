"""Probe: speculative K-ladder line search vs Nocedal-Wright on the
headline batched config (Rosenbrock n=100, batch 4096, m=16, 150 main
iterations + 12 df64 polish).  One jitted callable per config, fetch-synced
(CLAUDE.md tunnel rules).  Run: cd /root/repo && /opt/venv/bin/python
scripts/probe_speculative.py [k ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.batch import polish_solve, _merge_polished
    from lbfgspp_tpu.linesearch import make_speculative
    from lbfgspp_tpu.utils.objectives import rosenbrock

    batch, n, reps = 4096, 100, 3
    params = LBFGSParams(epsilon=1e-5, max_iterations=150, m=16)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), jnp.float32)

    ks = [int(a) for a in sys.argv[1:]] or [8]
    configs = [("nocedalwright", "nocedalwright")]
    configs += [(f"speculative-k{k}", make_speculative(k=k)) for k in ks]

    for name, ls in configs:
        def solve_one(x0, ls=ls):
            res = lbfgs.minimize(rosenbrock, x0, params, line_search=ls)
            pol = polish_solve(rosenbrock, res.x, params, 12)
            return _merge_polished(res, pol)

        solve = jax.jit(lambda xs: jax.vmap(solve_one)(xs))
        t0 = time.perf_counter()
        res = solve(x0s)
        np.asarray(res.fx)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            res = solve(x0s)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        xn = np.asarray(res.x, np.float64)
        q4 = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
        q3 = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-3))
        print(f"{name}: {batch * reps / dt:.0f} solves/s  q@1e-4={q4:.4f} "
              f"q@1e-3={q3:.4f}  mean_nfev={float(np.mean(np.asarray(res.nfev))):.0f} "
              f"(compile+first {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
