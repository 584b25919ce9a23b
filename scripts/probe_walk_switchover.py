"""walk vs walk_chunked GCP: a MEASURED switchover rule (VERDICT r4 task 7).

The budget table's one thin margin is the box family: the plain segment
walk pays one while-round (2 collectives) per crossed break-point
value, `walk_chunked` pays 2 collectives per K values plus K-fold local
membership work.  Round 4 left the engagement rule as an argument; this
probe measures both on the 8-virtual-device CPU mesh across crossing
counts c (constructed exactly: c coordinates get break values spread
below the first-segment stop Delta-t = 1, the rest sit far above) and
K in {16, 64, 256}, K-differencing two chained-rep counts to cancel
dispatch.

The CPU mesh measures REAL round counts with near-zero collective
latency, so walk time ~ c * round_cost_local and chunked time ~
(c/K) * round_cost_local + local_membership(c, K): the crossover in
wall time on this fabric UNDER-states chunked's advantage on real ICI
(each round there additionally pays ~2 x 50 us) — i.e. the measured
threshold is an upper bound for hardware.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        /opt/venv/bin/python scripts/probe_walk_switchover.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P

    from lbfgspp_tpu.ops import bmat, cauchy

    n = 1 << 16
    m = 6
    ndev = 8
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("feat",))
    R1, R2 = 2, 10

    def make_problem(c):
        # x0 = 0, g = 1 everywhere, ub far: break points t_i =
        # (x0 - lb)/|d| = -lb.  c coordinates get t in (0, 0.9) (crossed
        # before the Delta-t ~ 1 stop of the theta=1 empty-history
        # model), the rest t = 100.
        rng = np.random.default_rng(c)
        lb = np.full(n, -100.0, np.float32)
        idx = rng.choice(n, size=c, replace=False)
        lb[idx] = -(0.05 + 0.85 * rng.random(c)).astype(np.float32)
        return (jnp.zeros(n, jnp.float32), jnp.ones(n, jnp.float32),
                jnp.asarray(lb), jnp.full(n, 100.0, jnp.float32))

    def build(gcp_name, chunk):
        def local(x0l, gl, lbl, ubl):
            bh = bmat.init_b_history(x0l.shape[0], m, jnp.float32)

            def body(carry, i):
                # perturb g per rep so the loop cannot be hoisted
                gp = gl + jnp.float32(1e-30) * i.astype(jnp.float32)
                if gcp_name == "walk":
                    cp = cauchy.cauchy_point_walk(bh, x0l, gp, lbl, ubl,
                                                  "feat")
                else:
                    cp = cauchy.cauchy_point_walk_chunked(
                        bh, x0l, gp, lbl, ubl, "feat", chunk=chunk)
                return carry + lax.psum(jnp.sum(cp.xcp), "feat"), None

            def run(reps):
                out, _ = lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(reps, dtype=jnp.int32))
                return out
            return run

        def wrap(reps):
            def fl(x0l, gl, lbl, ubl):
                return local(x0l, gl, lbl, ubl)(reps)
            sm = jax.shard_map(fl, mesh=mesh,
                               in_specs=(P("feat"),) * 4,
                               out_specs=P())
            return jax.jit(sm)
        return wrap

    variants = [("walk", None), ("chunked K=16", 16),
                ("chunked K=64", 64), ("chunked K=256", 256)]
    print(f"n={n}, {ndev}-device CPU mesh, K-diff reps {R1}/{R2}",
          flush=True)
    for c in (4, 16, 64, 256, 1024, 4096):
        prob = make_problem(c)
        line = f"c={c:5d}:"
        for name, K in variants:
            wrap = build("walk" if K is None else "chunked", K)
            try:
                f1, f2 = wrap(R1), wrap(R2)
                float(np.asarray(f1(*prob)))       # compile+warm
                t0 = time.perf_counter(); float(np.asarray(f1(*prob)))
                t1 = time.perf_counter() - t0
                float(np.asarray(f2(*prob)))
                t0 = time.perf_counter(); float(np.asarray(f2(*prob)))
                t2 = time.perf_counter() - t0
                per = (t2 - t1) / (R2 - R1)
                line += f"  {name} {per * 1e3:8.2f} ms"
            except Exception as e:
                line += f"  {name} FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
