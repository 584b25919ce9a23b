"""Dtype coverage: the solvers run in f64, f32 and bf16.

The reference exercises double and float (example-rosenbrock.cpp:33-34);
the TPU build adds bfloat16.  Lower precisions get proportionally looser
convergence targets — the gradient-norm floor scales with the dtype eps.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lbfgspp_tpu import LBFGSParams, LBFGSBParams, minimize, minimize_b
from lbfgspp_tpu.utils.objectives import rosenbrock_fg, rosenbrock


def test_f32_unconstrained():
    res = minimize(fun_and_grad=rosenbrock_fg,
                   x0=jnp.zeros((10,), jnp.float32),
                   params=LBFGSParams(epsilon=1e-4, max_iterations=200))
    assert res.x.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(res.x, np.float64), 1.0,
                               atol=1e-3)


def test_bf16_unconstrained():
    # bf16 has ~3 decimal digits; expect coarse convergence to the basin.
    res = minimize(rosenbrock, jnp.zeros((4,), jnp.bfloat16),
                   params=LBFGSParams(epsilon=0.125, max_iterations=100))
    assert res.x.dtype == jnp.bfloat16
    x = np.asarray(res.x, np.float64)
    assert np.all(np.abs(x - 1.0) < 0.2)


def test_f32_box():
    n = 10
    res = minimize_b(fun_and_grad=rosenbrock_fg,
                     x0=jnp.full((n,), 3.0, jnp.float32),
                     lb=jnp.full((n,), 2.0, jnp.float32),
                     ub=jnp.full((n,), 4.0, jnp.float32),
                     params=LBFGSBParams(epsilon=1e-3, max_iterations=100))
    assert res.x.dtype == jnp.float32
    assert int(res.status) in (1, 2, 3)
    assert np.isfinite(float(res.fx))
    # f64 solve of the same problem agrees on the objective to f32 accuracy
    res64 = minimize_b(fun_and_grad=rosenbrock_fg,
                       x0=jnp.full((n,), 3.0),
                       lb=jnp.full((n,), 2.0), ub=jnp.full((n,), 4.0),
                       params=LBFGSBParams())
    np.testing.assert_allclose(float(res.fx), float(res64.fx), rtol=1e-3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_result_dtypes_propagate(dtype):
    res = minimize(rosenbrock, jnp.zeros((6,), dtype),
                   params=LBFGSParams(epsilon=1e-3, max_iterations=50))
    assert res.x.dtype == dtype
    assert res.fx.dtype == dtype
    assert res.history.s.dtype == dtype
