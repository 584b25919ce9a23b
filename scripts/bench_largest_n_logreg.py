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
    m = 6
    K1, K2 = 6, 16

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("feat",))
    shard = sharding_for(mesh)
    n = 1 << log2n

    def local_fg(w_local):
        # regenerate this shard's design slice from seed per evaluation
        idx = jax.lax.axis_index("feat")
        akey = jax.random.fold_in(jax.random.PRNGKey(0), idx)
        a_local = (jax.random.normal(akey, (rows, w_local.shape[0]),
                                     jnp.float32) / float(np.sqrt(n)))
        b = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (rows,),
                                       jnp.float32))
        logits = jax.lax.psum(a_local @ w_local, "feat")
        z = -b * logits
        fx = jnp.sum(jnp.logaddexp(0.0, z))
        dlogit = -b * jax.nn.sigmoid(z)
        return fx, a_local.T @ dlogit

    x0 = jax.jit(lambda: jnp.zeros((n,), jnp.float32),
                 out_shardings=shard)()
    x0.block_until_ready()

    def timed(k):
        p = LBFGSParams(epsilon=0.0, epsilon_rel=0.0, max_iterations=k,
                        m=m)
        f = jax.jit(lambda x: minimize_sharded(
            local_fun_and_grad=local_fg, x0=x, params=p, mesh=mesh,
            history_dtype=jnp.bfloat16))
        try:
            res = f(x0)
            fx = float(np.asarray(res.fx))
        except Exception as e:
            print(f"n=2^{log2n}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})", flush=True)
            return None
        t0 = time.perf_counter()
        res = f(x0)
        fx = float(np.asarray(res.fx))
        dt = time.perf_counter() - t0
        print(f"  n=2^{log2n} K={k}: {dt:.3f} s  fx={fx:.5f}", flush=True)
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
