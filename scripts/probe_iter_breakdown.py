"""Per-component time breakdown of ONE headline iteration (VERDICT r4
task 2).

Measures, at the shipping headline shape (batch 4096 x n=100, m=16,
rinv direction, f32), scan-chained so dispatch amortizes:

  * objective value+grad (the pairwise-Rosenbrock reshape form)
  * trial-point construction + directional derivative (axpy + dot)
  * apply_hv (rinv compact two-loop direction)
  * update_history (gate + ring write + Gram maintenance + R^-1 column)
  * one full solver iteration (fixed-step drive; difference = line-search
    machinery + carry movement + loop overhead)

Then measures the accept-first-trial fast path: Nocedal-Wright with
max_linesearch=1 IS that semantics (evaluate one trial, exhaustion
returns it as best-so-far, LineSearchNocedalWright.h:185-194) — its
solve time vs the shipping budget bounds what collapsing the trial loop
could buy; its quality shows what it costs.

Usage:
    cd /root/repo && nohup /opt/venv/bin/python \
        scripts/probe_iter_breakdown.py > /tmp/probe_breakdown.log 2>&1 &
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 50          # scan-chained component reps
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lbfgspp_tpu import LBFGSParams, lbfgs
    from lbfgspp_tpu.ops import history as hist_ops
    from lbfgspp_tpu.utils.objectives import rosenbrock

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    batch = int(os.environ.get("PROBE_BATCH", 4096 if on_tpu else 128))
    n, m = 100, 16
    dtype = jnp.float32 if on_tpu else jnp.float64

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)), dtype)
    fg = jax.value_and_grad(rosenbrock)

    def timeit(f, *args):
        fj = jax.jit(f)                 # built ONCE (CLAUDE.md bench rule:
        out = fj(*args)                 # a fresh jit wrapper per rep is a
        np.asarray(jax.tree.leaves(out)[0])   # new cache key -> retrace)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fj(*args)
            np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / REPS

    # -- build a mid-solve state for realistic history contents --
    params = LBFGSParams(epsilon=1e-5, max_iterations=40, m=m)
    s = lbfgs.solver(rosenbrock, params, direction="rinv")
    st = jax.jit(jax.vmap(lambda x: s.run_fixed(s.init(x), 40)))(x0s)

    # 1. objective value+grad, scan-chained
    def obj_chain(xs):
        def body(c, _):
            fx, g = jax.vmap(fg)(c)
            return c + 1e-12 * g, fx
        return lax.scan(body, xs, None, length=K)[1]
    t_obj = timeit(obj_chain, x0s) / K

    # 2. trial construction + dg (axpy + dot + objective)
    def trial_chain(xs, ds):
        def body(c, _):
            x = c + 0.5 * ds                      # xp + step*d
            fx, g = jax.vmap(fg)(x)
            dg = jnp.einsum("bn,bn->b", g, ds)
            return c + 1e-12 * g, (fx, dg)
        return lax.scan(body, xs, None, length=K)[1]
    t_trial = timeit(trial_chain, x0s, st.drt) / K

    # 3. apply_hv (rinv)
    def hv_chain(hist, gs):
        def body(c, _):
            d = jax.vmap(lambda h, g: hist_ops.apply_hv(h, g, -1.0,
                                                        tri="rinv"))(hist, c)
            return c + 1e-12 * d, d[:, 0]
        return lax.scan(body, gs, None, length=K)[1]
    t_hv = timeit(hv_chain, st.hist, st.grad) / K

    # 4. update_history (gate + ring + Grams + R^-1 maintenance)
    def upd_chain(hist, ss, ys):
        def body(c, _):
            h2 = jax.vmap(lambda h, sv, yv: hist_ops.update_history(
                h, sv, yv, jnp.asarray(True))[0])(hist, c[0], c[1])
            return (c[0] + 1e-12, c[1]), h2.theta
        return lax.scan(body, (ss, ys), None, length=K)[1]
    sstep = 0.01 * st.drt
    ystep = 0.01 * st.grad
    t_upd = timeit(upd_chain, st.hist, sstep, ystep) / K

    # 5. full solver iteration (fixed drive over the same state)
    def iter_chain(st0):
        def body(c, _):
            c2 = jax.vmap(s.step)(c._replace(
                done=jnp.zeros_like(c.done)))
            return c2, c2.fx
        return lax.scan(body, st0, None, length=K)[1]
    t_iter = timeit(iter_chain, st) / K

    resid = t_iter - (t_obj + t_hv + t_upd)
    print(f"batch={batch} n={n} m={m} rinv ({backend}):", flush=True)
    print(f"  objective value+grad      {t_obj * 1e3:7.3f} ms", flush=True)
    print(f"  trial (axpy+obj+dot)      {t_trial * 1e3:7.3f} ms", flush=True)
    print(f"  apply_hv (rinv)           {t_hv * 1e3:7.3f} ms", flush=True)
    print(f"  update_history            {t_upd * 1e3:7.3f} ms", flush=True)
    print(f"  FULL solver iteration     {t_iter * 1e3:7.3f} ms", flush=True)
    print(f"  residual (ls machinery + carry + loop) "
          f"{resid * 1e3:7.3f} ms = {resid / t_iter * 100:.0f}%",
          flush=True)

    if os.environ.get("PROBE_SKIP_MLS"):
        return

    # -- accept-first-trial fast path: NW with max_linesearch=1 --
    from lbfgspp_tpu.batch import polish_solve, _merge_polished, deep_polish

    def headline(pp):
        def one(x0):
            res = lbfgs.minimize(rosenbrock, x0, pp, direction="rinv")
            if on_tpu:
                pol = polish_solve(rosenbrock, res.x, pp, 5,
                                   direction="rinv",
                                   warm_history=res.history)
                res = _merge_polished(res, pol)
            return res

        def f(xs):
            res = jax.vmap(one)(xs)
            if on_tpu:
                res = deep_polish(rosenbrock, res, pp, batch // 8, 60,
                                  direction="rinv")
            return res
        return f

    for tag, mls in (("ship mls=20", 20), ("accept-first mls=1", 1),
                     ("mls=2", 2)):
        pp = LBFGSParams(epsilon=1e-5, max_iterations=162, m=m,
                         max_linesearch=mls)
        f = jax.jit(headline(pp))
        res = f(x0s)
        np.asarray(res.fx)
        t0 = time.perf_counter()
        for _ in range(REPS):
            res = f(x0s)
            np.asarray(res.fx)
        dt = time.perf_counter() - t0
        xn = np.asarray(res.x, np.float64)
        q = float(np.mean(np.max(np.abs(xn - 1.0), axis=1) <= 1e-4))
        print(f"  {tag:22s} {batch * REPS / dt:10,.0f} solves/s  "
              f"q@1e-4={q:.4f}", flush=True)


if __name__ == "__main__":
    main()
