"""Anchor the reduction speed-of-light (VERDICT r4 task 4).

PERF.md's apply_hv roofline was checked against a "raw dot reduce"
calibration of 240 GB/s — 29% of the 819 GB/s HBM peak.  This probe
establishes the chip's real streaming-reduction ceiling.

Methodology (round-5, learned the hard way): through the axon tunnel a
single dispatch+fetch costs ~25 ms, and a ``lax.scan`` chain pays that
round trip once — so PER-STEP times from a single rep count are
round-trip-dominated (a 32-step scan reads ~0.9 ms/step at EVERY n;
that is 25/32 ms of tunnel, not compute).  Every number below is
therefore K-DIFFERENCED: the same jitted scan at two rep counts
(R1=32, R2=256), (t2 - t1) / (R2 - R1) cancels the round trip and the
scan setup, leaving the true marginal cost of one chained reduction.
Each scan step perturbs the input (``a + i*tiny``) so XLA cannot hoist
the reduction; the perturbation is fused into the read stream.

Usage:
    nohup /opt/venv/bin/python \
        scripts/probe_reduce_ceiling.py > /tmp/reduce_ceiling.log 2>&1 &
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

    hp = lax.Precision.HIGHEST
    R1, R2 = 32, 256

    def make_run(reduce_fn, reps):
        tiny = jnp.float32(1e-30)

        def run(a):
            def body(c, i):
                return c + reduce_fn(a + tiny * i.astype(jnp.float32)), None

            out, _ = lax.scan(body, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.int32))
            return out

        return jax.jit(run)

    def timed(fn, a, reps):
        run = make_run(fn, reps)
        float(np.asarray(run(a)))                 # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(run(a)))
        return time.perf_counter() - t0

    for log2n in (24, 25):
        n = 1 << log2n
        a = jax.jit(lambda key: jax.random.normal(key, (n,), jnp.float32))(
            jax.random.PRNGKey(0))
        a.block_until_ready()
        print(f"--- n = 2^{log2n} ({n * 4 / 1e9:.3f} GB/read) ---",
              flush=True)

        def naive_dot(x):
            return jnp.dot(x, x, precision=hp)

        def sum_square(x):
            return jnp.sum(x * x)

        def blocked(k):
            def f(x):
                x2 = x.reshape(k, n // k)
                return jnp.sum(jnp.einsum("kn,kn->k", x2, x2,
                                          precision=hp))
            return f

        variants = [("naive jnp.dot", naive_dot), ("sum(a*a)", sum_square),
                    ("blocked k=64", blocked(64)),
                    ("blocked k=1024", blocked(1024)),
                    ("blocked k=8192", blocked(8192))]
        for name, fn in variants:
            try:
                t1 = timed(fn, a, R1)
                t2 = timed(fn, a, R2)
            except Exception as e:
                print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:90]}",
                      flush=True)
                continue
            per = (t2 - t1) / (R2 - R1)
            print(f"  {name}: {per * 1e6:.0f} us/red -> "
                  f"{n * 4 / per / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
