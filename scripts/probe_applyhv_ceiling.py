"""Re-measure apply_hv's large-n cost against the TRUE reduction ceiling
(VERDICT r4 task 4, second half).

probe_reduce_ceiling.py (round 5) found the chip's streaming-reduction
ceiling is ~705-756 GB/s (86-92% of the 819 GB/s HBM peak), not the
240 GB/s round-trip-contaminated figure round 2 recorded — so the old
"apply_hv runs at reduction speed-of-light" conclusion is re-checked
here with the same K-differenced methodology: chained dependent
apply_hv calls in one lax.scan at two rep counts, (t2-t1)/(R2-R1).

The history is synthesized directly (random rows + consistent Grams via
one [2m+2, 2]-style product per slot, built EAGERLY on device in m tiny
steps) rather than through an in-jit add_correction scan — the first
version of this probe wedged the remote compiler for 20+ minutes on
that scan (CLAUDE.md documents the wedge failure mode; killed and
rewritten leaner).

Usage:
    nohup /opt/venv/bin/python \
        scripts/probe_applyhv_ceiling.py > /tmp/applyhv_ceiling.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lbfgspp_tpu.ops import history as hist_ops

    R1, R2 = 8, 40
    log2n = 24
    n = 1 << log2n

    def build_hist(m, store_dtype, with_rinv):
        h = hist_ops.init_history(n, m, jnp.float32,
                                  store_dtype=store_dtype,
                                  with_rinv=with_rinv)
        add = jax.jit(lambda h, s, y: hist_ops.add_correction(
            h, s, y, jnp.asarray(True)))
        mk = jax.jit(lambda k: (
            jax.random.normal(k, (n,), jnp.float32) / np.sqrt(n)))
        for i in range(m):
            k1 = jax.random.fold_in(jax.random.PRNGKey(7), i)
            s = mk(k1)
            y = s * 2.0 + mk(jax.random.fold_in(k1, 1))
            h = add(h, s, y)
        jax.block_until_ready(h.s)
        return h

    def timed(m, store_dtype, tri, label):
        hist = build_hist(m, store_dtype, tri == "rinv")
        v0 = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))(
            jax.random.PRNGKey(3))
        v0.block_until_ready()

        def run(reps):
            # NOTE: hist is a jit ARGUMENT, not a closure constant — a
            # closed-over [m, 2^24] history embeds ~400 MB of constants
            # in the compile RPC, which wedges the remote compiler
            # (CLAUDE.md "large host->device constants poison remote
            # compiles"; cost this probe two 15-minute hangs).
            def body(h, v, _):
                r = hist_ops.apply_hv(h, v, -1.0, tri=tri)
                return r / jnp.float32(2.0) + v * jnp.float32(0.25), None
            f = jax.jit(lambda h, v: lax.scan(
                lambda c, x: body(h, c, x), v, None, length=reps)[0].sum())
            float(np.asarray(f(hist, v0)))
            t0 = time.perf_counter()
            float(np.asarray(f(hist, v0)))
            return time.perf_counter() - t0

        t1, t2 = run(R1), run(R2)
        per = (t2 - t1) / (R2 - R1)
        bpe = 2 if store_dtype == jnp.bfloat16 else 4
        traffic = 2 * 2 * m * n * bpe + 4 * n * 4
        print(f"{label}: {per * 1e3:.2f} ms/apply -> "
              f"{traffic / per / 1e9:.0f} GB/s effective "
              f"({traffic / 1e9:.2f} GB/apply)", flush=True)
        return per

    print(f"n = 2^{log2n}", flush=True)
    timed(6, None, "sweeps", "m=6 f32 sweeps")
    # padding check: m=6 rows pad to 8 sublanes, so m=8 should stream
    # the SAME physical bytes — the 7th/8th history slots are free
    timed(8, None, "sweeps", "m=8 f32 sweeps")
    timed(6, jnp.bfloat16, "sweeps", "m=6 bf16 sweeps")
    timed(16, None, "sweeps", "m=16 f32 sweeps")


if __name__ == "__main__":
    main()
