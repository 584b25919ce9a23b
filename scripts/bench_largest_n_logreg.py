"""Largest single-chip n for the NORTH-STAR workload: sharded logistic
regression (BASELINE.md "Sharded n=1e9 L-BFGS (logistic-regression
fit)").

Same harness as scripts/bench_largest_n.py (sharded API on a 1-device
mesh, bf16 history, on-device data, fixed-trip K-differencing) but with
the non-separable logreg objective: the design-matrix slice is
regenerated ON DEVICE inside every evaluation (jax.random.normal from a
folded key — at huge n the A matrix cannot be materialized anyway, the
regenerate-from-seed pattern IS the production shape), and the logit
psum makes it the one-collective-per-evaluation pattern of
utils.objectives.make_sharded_logreg.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/bench_largest_n_logreg.py > /tmp/largen_logreg.log 2>&1 &
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
    from lbfgspp_tpu.parallel.sharded import minimize_sharded, sharding_for

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    log2n = int(os.environ.get("PROBE_LOG2N", 25 if on_tpu else 20))
    rows = 8
    m = int(os.environ.get("PROBE_M", 6))
    K1, K2 = 6, 16

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("feat",))
    shard = sharding_for(mesh)
    n = 1 << log2n

    # Row-chunked design-matrix regeneration: at n = 2^27 the full
    # [rows, n] f32 slice is 4.3 GB and OOMs next to the solver carries,
    # so the matmul pair runs over row chunks, regenerating each chunk
    # from its seed in BOTH passes (value and gradient) — peak objective
    # footprint drops to [chunk, n] at a 2x RNG cost.  chunks=1 is the
    # original single-shot shape.
    row_chunks = int(os.environ.get("PROBE_ROW_CHUNKS",
                                    2 if log2n >= 27 else 1))
    rc = rows // row_chunks

    def make_local_fg(axis_name):
        def local_fg(w_local):
            idx = (jax.lax.axis_index(axis_name)
                   if axis_name is not None else jnp.int32(0))
            b = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (rows,),
                                           jnp.float32))

            def a_chunk(c):
                akey = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(0), idx), c)
                return (jax.random.normal(akey, (rc, w_local.shape[0]),
                                          jnp.float32) / float(np.sqrt(n)))

            if row_chunks == 1:
                a_local = a_chunk(0)
                logits = a_local @ w_local
                if axis_name is not None:
                    logits = jax.lax.psum(logits, axis_name)
                z = -b * logits
                fx = jnp.sum(jnp.logaddexp(0.0, z))
                dlogit = -b * jax.nn.sigmoid(z)
                return fx, a_local.T @ dlogit

            # lax.scan serializes the chunk regenerations — at n = 2^27
            # the full [rows, n] slice (4.3 GB) cannot be live next to
            # the solver carries, and a Python-loop form lets the
            # scheduler overlap chunk lifetimes.
            def fwd(_, c):
                return None, a_chunk(c) @ w_local

            _, lg = jax.lax.scan(fwd, None,
                                 jnp.arange(row_chunks, dtype=jnp.int32))
            logits = lg.reshape(rows)
            if axis_name is not None:
                logits = jax.lax.psum(logits, axis_name)
            z = -b * logits
            fx = jnp.sum(jnp.logaddexp(0.0, z))
            dlogit = -b * jax.nn.sigmoid(z)

            def bwd(g, c):
                dl = jax.lax.dynamic_slice_in_dim(dlogit, c * rc, rc)
                return g + a_chunk(c).T @ dl, None

            grad, _ = jax.lax.scan(bwd, jnp.zeros_like(w_local),
                                   jnp.arange(row_chunks, dtype=jnp.int32))
            return fx, grad
        return local_fg

    local_fg = make_local_fg("feat")

    x0 = jax.jit(lambda: jnp.zeros((n,), jnp.float32),
                 out_shardings=shard)()
    x0.block_until_ready()

    def timed(k, plain=False):
        p = LBFGSParams(epsilon=0.0, epsilon_rel=0.0, max_iterations=k,
                        m=m)
        if plain:
            # 1-device fallback when the shard_map wrapper's buffer
            # copies OOM: the identical per-shard program with the psum
            # compiled out (see bench_largest_n.py).
            from lbfgspp_tpu import lbfgs
            fg1 = make_local_fg(None)
            f = jax.jit(lambda x: lbfgs.minimize(
                fun_and_grad=fg1, x0=x, params=p,
                history_dtype=jnp.bfloat16))
        else:
            f = jax.jit(lambda x: minimize_sharded(
                local_fun_and_grad=local_fg, x0=x, params=p, mesh=mesh,
                history_dtype=jnp.bfloat16))
        try:
            res = f(x0)
            fx = float(np.asarray(res.fx))
            del res
            t0 = time.perf_counter()
            res = f(x0)
            fx = float(np.asarray(res.fx))
            dt = time.perf_counter() - t0
            del res
        except Exception as e:
            print(f"n=2^{log2n}{' plain' if plain else ' sharded'}: "
                  f"FAILED ({type(e).__name__}: {str(e)[:160]})",
                  flush=True)
            if not plain:
                return timed(k, plain=True)
            return None
        print(f"  n=2^{log2n} K={k}"
              f"{' (plain)' if plain else ' (sharded)'}: {dt:.3f} s  "
              f"fx={fx:.5f}", flush=True)
        return dt

    t1 = timed(K1)
    t2 = timed(K2) if t1 is not None else None
    if t2 is None:
        return
    per_iter = (t2 - t1) / (K2 - K1)
    print(f"sharded logreg n=2^{log2n} rows={rows}: "
          f"{per_iter * 1e3:.1f} ms/iter ({1.0 / per_iter:.2f} iters/s); "
          f"pod arithmetic: n=1e9 -> {int(np.ceil(1e9 / n))} chips, "
          f"6+1 all-reduce/iter (logit psum included) ~ 0.35 ms vs "
          f"{per_iter * 1e3:.1f} ms local -> "
          f">= {per_iter / (per_iter + 0.35e-3) * 100:.1f}% modeled "
          f"scaling", flush=True)


if __name__ == "__main__":
    main()
