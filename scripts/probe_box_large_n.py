"""Probe: LARGE-n box-constrained solve cost (the huge-n L-BFGS-B regime).

The reference's GCP is an O(n)-trip sequential breakpoint walk
(Cauchy.h:131-256); at n = 2^20 that is a ~10^6-step lax.scan PER
ITERATION — infeasible.  The sortless segment walk
(ops/cauchy.py::cauchy_point_walk) needs one round per distinct crossed
break point before the early stop, independent of n.  This probe runs a
full box solve at large n with gcp="walk" and reports wall time per
iteration (tunnel caveats apply: nested while_loops pay the remote
harness overhead per iteration, see PERF.md).

Usage: /opt/venv/bin/python scripts/probe_box_large_n.py [log2_n ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from lbfgspp_tpu import LBFGSBParams, lbfgsb

    logs = [int(a) for a in sys.argv[1:]] or [20]
    gcps = os.environ.get("BOX_GCPS", "prefix_sorted,walk").split(",")
    for log2n in logs:
        n = 1 << log2n
        dtype = jnp.float32
        params = LBFGSBParams(epsilon=1e-5, max_iterations=30)
        lb = jnp.full((n,), 2.0, dtype)
        ub = jnp.full((n,), 4.0, dtype)

        def rosen(x):
            xe = x.reshape(-1, 2)[:, 0]
            xo = x.reshape(-1, 2)[:, 1]
            return jnp.sum((1.0 - xe) ** 2 + 100.0 * (xo - xe * xe) ** 2)

        for gcp in gcps:
            s = lbfgsb.solver(rosen, lb, ub, params, gcp=gcp)

            @jax.jit
            def solve(key, s=s):
                x0 = jax.random.uniform(key, (n,), dtype, 2.0, 4.0)
                st = s.run(s.init(x0))
                r = s.finalize(st)
                return r.fx, r.niter, r.status, r.gnorm

            t0 = time.perf_counter()
            out = solve(jax.random.PRNGKey(0))
            fx, niter, status, gnorm = [np.asarray(o) for o in out]
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = solve(jax.random.PRNGKey(1))
            fx, niter, status, gnorm = [np.asarray(o) for o in out]
            dt = time.perf_counter() - t0
            print(f"n=2^{log2n} gcp={gcp}: {float(dt):.2f}s total, "
                  f"niter={int(niter)} "
                  f"({1e3 * dt / max(int(niter), 1):.0f} ms/iter), "
                  f"fx={float(fx):.6g}, proj-gnorm={float(gnorm):.3g}, "
                  f"status={int(status)} (compile+first {tc:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
