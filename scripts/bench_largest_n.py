"""Largest single-chip n the HBM allows (VERDICT r4 task 3).

Runs the SHARDED-API solver (1-device mesh, ``axis_name`` collectives
compiled to no-ops on one chip — the same program a pod runs per shard)
on pairwise Rosenbrock at the largest n that fits one v5e chip's 16 GB
HBM, with ``history_dtype=bfloat16`` halving the dominant [2m, n]
history streams.  Reports iterations/s and the per-iteration byte
accounting that turns BASELINE.md's n=1e9 >= 80%-scaling target into
arithmetic (PERF.md "Largest single-chip n" table).

Everything is generated ON device (host->device constants poison the
remote-compile RPC, CLAUDE.md) and timing syncs by device-to-host
fetches.  Iteration cost is isolated by differencing two fixed-trip
run_fixed calls (K2 - K1 iterations), which cancels compile/init/fetch
constants.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/bench_largest_n.py > /tmp/bench_largest_n.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lbfgspp_tpu import LBFGSParams
    from lbfgspp_tpu.parallel.sharded import sharding_for
    from lbfgspp_tpu.utils.objectives import rosenbrock_split

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    # Round-4's "2^26 rejection" was NOT a compile-helper buffer limit:
    # it was the rosenbrock objective's reshape(-1, 2) — a [n/2, 2]
    # value whose minor dim of 2 pads to the 128-lane tile, a 64x-padded
    # (17 GB at 2^26) layout the AOT compiler rejects for HBM capacity.
    # rosenbrock_split (pair i = (x_i, x_{i+n/2}); same separable
    # problem family under a fixed index permutation) keeps the minor
    # dim large; with it every octave below compiles and runs.
    log2ns = (27, 26, 25) if on_tpu else (20,)
    m = 6
    K1, K2 = 6, 16

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("feat",))

    from lbfgspp_tpu.parallel.sharded import minimize_sharded

    for log2n in log2ns:
        n = 1 << log2n
        shard = sharding_for(mesh)

        # x0 is generated ON device by its own tiny jitted program (a
        # host-built 512 MB argument would crawl through the tunnel).
        try:
            x0 = jax.jit(
                lambda k: 2.0 * jax.random.uniform(k, (n,),
                                                   jnp.float32) - 1.0,
                out_shardings=shard)(jax.random.PRNGKey(0))
            x0.block_until_ready()
        except Exception as e:
            print(f"n=2^{log2n}: x0 alloc FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})", flush=True)
            continue

        def timed(k, plain=False):
            # epsilon=0 never fires -> the while loop runs exactly k
            # iterations; differencing two k values cancels the
            # init/compile/fetch constants.
            p = LBFGSParams(epsilon=0.0, epsilon_rel=0.0,
                            max_iterations=k, m=m)
            if plain:
                # The 1-device shard_map wrapper carries extra buffer
                # copies that OOM the chip one octave before the plain
                # program does; the plain path is the identical per-shard
                # computation with the collectives compiled out
                # (axis_name=None), so its per-iteration cost is the
                # per-shard local work the pod model needs.  The sharded
                # wrapper's equal cost is cross-checked at the largest n
                # it fits (see log output).
                from lbfgspp_tpu import lbfgs
                f = jax.jit(lambda x: lbfgs.minimize(
                    rosenbrock_split, x, p,
                    history_dtype=jnp.bfloat16))
            else:
                f = jax.jit(lambda x: minimize_sharded(
                    rosenbrock_split, x, p, mesh=mesh,
                    history_dtype=jnp.bfloat16))
            try:
                res = f(x0)
                fx = float(np.asarray(res.fx))     # sync
                niter = int(np.asarray(res.niter))
                # Drop the warm-up result's ~n-vector buffers BEFORE the
                # timed re-invocation: at the largest n the chip cannot
                # hold two results plus the running solve at once.
                del res
                t0 = time.perf_counter()
                res = f(x0)
                fx = float(np.asarray(res.fx))
                dt = time.perf_counter() - t0
                del res
            except Exception as e:  # OOM at this n
                print(f"n=2^{log2n}{' plain' if plain else ' sharded'}: "
                      f"FAILED ({type(e).__name__}: {str(e)[:200]})",
                      flush=True)
                if not plain:
                    return timed(k, plain=True)
                return None
            print(f"  n=2^{log2n} K={k}"
                  f"{' (plain)' if plain else ' (sharded)'}: {dt:.3f} s  "
                  f"fx={fx:.4e} niter={niter}", flush=True)
            return dt

        t1 = timed(K1)
        if t1 is None:
            continue
        t2 = timed(K2)
        if t2 is None:
            continue
        per_iter = (t2 - t1) / (K2 - K1)

        # Byte accounting per iteration (m=6, bf16 history, f32 vectors):
        # apply_hv reads the [2m, n] history twice (W'v pass + recombine
        # pass); update_history reads s,y + writes one ring row pair +
        # reads for the Gram products (fused); objective + line search
        # touch ~6 n-vectors f32.
        hist_bytes = 2 * (2 * m) * n * 2          # two passes over bf16 S,Y
        upd_bytes = (2 * m) * n * 2 + 4 * n * 4   # Gram read + rw of s,y
        vec_bytes = 10 * n * 4                    # x, g, d, trial, axpys
        total = hist_bytes + upd_bytes + vec_bytes
        print(f"n=2^{log2n}: {per_iter * 1e3:.1f} ms/iter "
              f"({1.0 / per_iter:.2f} iters/s), ~{total / 1e9:.2f} GB/iter "
              f"touched -> {total / per_iter / 1e9:.0f} GB/s effective",
              flush=True)
        print(f"  pod extrapolation: n=1e9 needs "
              f"{int(np.ceil(1e9 / n))} chips at n_local=2^{log2n}; "
              f"6 all-reduce latencies/iter (audited) ~ 0.3 ms vs "
              f"{per_iter * 1e3:.1f} ms local work -> scaling efficiency "
              f">= {per_iter / (per_iter + 0.3e-3) * 100:.1f}% "
              f"(latency fully exposed, no overlap credited)", flush=True)


if __name__ == "__main__":
    main()
