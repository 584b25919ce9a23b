"""TPU validation of the round-2 solver families: OWL-QN and stochastic.

Measures (a) batched OWL-QN lasso throughput (vmap over instances) and the
KKT quality of the f32 solutions, (b) multi-batch stochastic L-BFGS
iteration rate on a logistic regression whose data lives on-device
(generated inside jit — large host constants poison remote compiles).

Run (one TPU process at a time!):
    cd /root/repo && nohup /opt/venv/bin/python scripts/probe_families.py \
        > /tmp/probe_families.log 2>&1 &
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lbfgspp_tpu import LBFGSParams, minimize_owlqn
from lbfgspp_tpu.stochastic import minimize_stochastic


def sync(x):
    return np.asarray(x)  # device->host fetch is the only reliable sync


def probe_owlqn(batch=1024, m_rows=128, n=64, reps=3,
                fast_phase_epsilon=None, tag=""):
    print(f"[owlqn{tag}] batch={batch} lasso m={m_rows} n={n} f32",
          flush=True)

    def make_and_solve(key):
        kA, kw, kn2 = jax.random.split(key, 3)
        A = jax.random.normal(kA, (m_rows, n), jnp.float32) / np.sqrt(m_rows)
        w = jnp.zeros(n, jnp.float32).at[:6].set(
            jax.random.normal(kw, (6,), jnp.float32) * 3)
        b = A @ w + 0.02 * jax.random.normal(kn2, (m_rows,), jnp.float32)
        lam = 0.01

        def loss(x):
            return 0.5 * jnp.sum((A @ x - b) ** 2)

        res = minimize_owlqn(loss, jnp.zeros(n, jnp.float32), lam,
                             LBFGSParams(epsilon=1e-5, epsilon_rel=0.0,
                                         max_iterations=150),
                             fast_phase_epsilon=fast_phase_epsilon)
        # KKT violation in f32
        g = jax.grad(loss)(res.x)
        at0 = res.x == 0
        v = jnp.where(at0, jnp.maximum(jnp.abs(g) - lam, 0.0),
                      jnp.abs(g + lam * jnp.sign(res.x)))
        return res.fx, jnp.max(v), jnp.sum(res.x != 0), res.niter

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    solve = jax.jit(jax.vmap(make_and_solve))
    out = solve(keys); sync(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve(keys); sync(out[0])
    dt = time.perf_counter() - t0
    fx, kkt, nnz, niter = (np.asarray(o) for o in out)
    print(f"[owlqn{tag}] {batch*reps/dt:,.0f} solves/s/chip; "
          f"kkt p50={np.median(kkt):.2e} p99={np.percentile(kkt,99):.2e}; "
          f"nnz p50={np.median(nnz):.0f}; niter p50={np.median(niter):.0f}",
          flush=True)


def probe_stochastic(n_rows=1 << 16, dim=256, batch=4096, steps=100,
                     reps=3):
    print(f"[stoch] logreg rows={n_rows} dim={dim} batch={batch} "
          f"steps={steps} f32", flush=True)

    def run(key):
        kw, kX, ky = jax.random.split(key, 3)
        w_true = jax.random.normal(kw, (dim,), jnp.float32)
        X = jax.random.normal(kX, (n_rows, dim), jnp.float32)
        y = (jax.random.uniform(ky, (n_rows,)) <
             jax.nn.sigmoid(X @ w_true)).astype(jnp.float32)
        data = {"X": X, "y": y}

        def loss(w, b):
            logits = b["X"] @ w
            return jnp.mean(jnp.logaddexp(0.0, logits) - b["y"] * logits)

        p = LBFGSParams(m=8, max_iterations=steps)
        res = minimize_stochastic(loss, jnp.zeros(dim, jnp.float32), data,
                                  p, batch_size=batch, overlap_frac=0.25,
                                  step_size=0.5)
        return res.fx, res.gnorm, loss(res.x, data)

    run_j = jax.jit(run)
    out = run_j(jax.random.PRNGKey(1)); sync(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_j(jax.random.PRNGKey(1)); sync(out[0])
    dt = time.perf_counter() - t0
    print(f"[stoch] {steps*reps/dt:,.1f} iterations/s/chip "
          f"(full run {dt/reps*1e3:.0f} ms); last-batch fx={float(out[0]):.4f} "
          f"full-data loss={float(out[2]):.4f}", flush=True)


if __name__ == "__main__":
    import sys as _sys
    print("backend:", jax.default_backend(), flush=True)
    if "--two-phase-only" in _sys.argv:
        # Two-phase matmul-precision schedule: fast bf16-pass phase to the
        # noise floor, float32-precision endgame to 1e-5.  NOTE the floor
        # applies to the pseudo-gradient NORM: per-coordinate bf16 noise
        # ~1e-4 means a norm floor of ~sqrt(n)*1e-4 (~1e-3 at n=64).
        floor = float(os.environ.get("PROBE_2PH_FLOOR", 1e-3))
        kw = dict(batch=int(os.environ.get("PROBE_2PH_BATCH", 1024)),
                  m_rows=int(os.environ.get("PROBE_2PH_ROWS", 128)),
                  n=int(os.environ.get("PROBE_2PH_N", 64)))
        probe_owlqn(fast_phase_epsilon=floor, tag=f"/2ph@{floor:g}", **kw)
        with jax.default_matmul_precision("float32"):
            print("[owlqn] -- matmul precision float32 (single phase) --",
                  flush=True)
            probe_owlqn(tag="/f32", **kw)
        _sys.exit(0)
    # TPU f32 matmuls default to bf16 passes; the lasso gradient then
    # carries ~1e-4 noise and the 1e-5 pseudo-gradient test never fires.
    # Measure both precisions to separate solver cost from matmul mode.
    probe_owlqn()
    with jax.default_matmul_precision("float32"):
        print("[owlqn] -- matmul precision float32 --", flush=True)
        probe_owlqn()
    probe_stochastic()
