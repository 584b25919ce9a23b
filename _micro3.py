import numpy as np, time
import jax, jax.numpy as jnp
from jax import lax
from lbfgspp_tpu.ops import history as H
from lbfgspp_tpu import LBFGSParams, minimize
from lbfgspp_tpu.utils.objectives import rosenbrock

batch, m, n = 4096, 6, 100
ITERS = 200
rng = np.random.default_rng(0)
s = jnp.asarray(rng.standard_normal((batch, m, n)), jnp.float32)
y = s + 0.1 * jnp.asarray(rng.standard_normal((batch, m, n)), jnp.float32)
def add_all(hist, s, y):
    for i in range(m):
        hist = H.add_correction(hist, s[i], y[i], jnp.asarray(True))
    return hist
hist = jax.vmap(add_all)(jax.vmap(lambda _: H.init_history(n, m, jnp.float32))(jnp.arange(batch)), s, y)
v0 = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

@jax.jit
def chain(hist, v):
    def step(v, _):
        v = jax.vmap(lambda h, vv: H.apply_hv(h, vv, -1.0))(hist, v)
        v = v / (1.0 + jnp.max(jnp.abs(v), axis=1, keepdims=True))
        return v, None
    v, _ = lax.scan(step, v, None, length=ITERS)
    return v

out = np.asarray(chain(hist, v0))
t0 = time.perf_counter(); out = np.asarray(chain(hist, v0))
dt = (time.perf_counter() - t0) / ITERS
bytes_per = (4*m*n + 2*n) * 4 * batch
print(f"apply_hv jacobi: {dt*1e6:.1f} us/call, {bytes_per/dt/1e9:.1f} GB/s", flush=True)

# full solver
params = LBFGSParams(epsilon=1e-5, max_iterations=200)
solve = jax.jit(lambda x0s: jax.vmap(lambda x0: minimize(rosenbrock, x0, params))(x0s).fx)
x0s = jnp.asarray(rng.uniform(-2, 2, (batch, 100)), jnp.float32)
np.asarray(solve(x0s))
ts = []
for _ in range(3):
    xi = jnp.asarray(rng.uniform(-2, 2, (batch, 100)), jnp.float32)
    t0 = time.perf_counter(); np.asarray(solve(xi)); ts.append(time.perf_counter()-t0)
print(f"solver: {min(ts):.3f}s -> {batch/min(ts):.0f} solves/s", flush=True)
