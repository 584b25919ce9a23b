import numpy as np, time
import jax, jax.numpy as jnp
from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock
t00 = time.time()
def stamp(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
params = LBFGSParams(epsilon=1e-5, max_iterations=200)
def solve_batch(x0s):
    res = jax.vmap(lambda x0: minimize(rosenbrock, x0, params))(x0s)
    return res.fx, res.niter, res.status, res.x
solve = jax.jit(solve_batch)
rng = np.random.default_rng(0)
x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (4096, 100)), jnp.float32)
stamp("input ready")
out = solve(x0s)
stamp("dispatched")
fx = np.asarray(out[0])
stamp("first fetch done")
for r in range(3):
    xi = jnp.asarray(rng.uniform(-2.0, 2.0, (4096, 100)), jnp.float32)
    t0 = time.perf_counter()
    out = solve(xi); fx = np.asarray(out[0])
    stamp(f"rep {r}: {time.perf_counter()-t0:.3f}s -> {4096/(time.perf_counter()-t0):.0f} solves/s")
