import numpy as np, time
import jax, jax.numpy as jnp
from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock

rng = np.random.default_rng(0)

def run(batch, max_iter, tag):
    params = LBFGSParams(epsilon=1e-5, max_iterations=max_iter, max_linesearch=60)
    def solve_batch(x0s):
        res = jax.vmap(lambda x0: minimize(rosenbrock, x0, params))(x0s)
        return res.fx, res.niter
    solve = jax.jit(solve_batch)
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, 100)), jnp.float32)
    np.asarray(solve(x0s)[0])  # compile+run
    ts = []
    for _ in range(2):
        xi = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, 100)), jnp.float32)
        t0 = time.perf_counter()
        fx, niter = solve(xi)
        fx = np.asarray(fx)
        ts.append(time.perf_counter()-t0)
    print(f"{tag}: batch={batch} maxit={max_iter} t={min(ts):.3f}s "
          f"-> {batch/min(ts):.0f} solves/s, mean niter {np.asarray(niter).mean():.0f}", flush=True)

run(1024, 50, "iters50")
run(1024, 200, "iters200")
run(4096, 200, "b4096")
run(16384, 200, "b16384")
