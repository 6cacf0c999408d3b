"""Golden tests for surrogate-gradient spike functions.

Values cross-checked against the analytic formulas used by SpikingJelly's
ATan/Sigmoid surrogates (see stereospike_tpu/snn/surrogate.py docstring).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.snn.surrogate import make_spike_fn, spike_atan, spike_sigmoid


def test_forward_is_heaviside():
    x = jnp.array([-2.0, -1e-6, 0.0, 1e-6, 3.0])
    np.testing.assert_array_equal(np.asarray(spike_atan(x)), [0, 0, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(spike_sigmoid(x)), [0, 0, 1, 1, 1])


@pytest.mark.parametrize("alpha", [1.0, 2.0, 5.0])
def test_atan_gradient_matches_formula(alpha):
    xs = np.linspace(-3, 3, 13, dtype=np.float32)
    g = jax.vmap(jax.grad(lambda x: spike_atan(x, alpha)))(jnp.asarray(xs))
    expected = alpha / (2.0 * (1.0 + (math.pi / 2 * alpha * xs) ** 2))
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


@pytest.mark.parametrize("alpha", [1.0, 4.0])
def test_sigmoid_gradient_matches_formula(alpha):
    xs = np.linspace(-3, 3, 13, dtype=np.float32)
    g = jax.vmap(jax.grad(lambda x: spike_sigmoid(x, alpha)))(jnp.asarray(xs))
    s = 1.0 / (1.0 + np.exp(-alpha * xs))
    np.testing.assert_allclose(np.asarray(g), alpha * s * (1 - s), rtol=1e-5)


def test_atan_gradient_peak_at_zero():
    # d/dx at x=0 is alpha/2: for default alpha=2.0 the peak derivative is 1.
    g0 = jax.grad(spike_atan)(0.0)
    assert np.isclose(float(g0), 1.0)


def test_make_spike_fn_dispatch():
    assert float(make_spike_fn("atan")(jnp.array(0.5))) == 1.0
    assert float(make_spike_fn("sigmoid", alpha=2.0)(jnp.array(-0.5))) == 0.0
    with pytest.raises(ValueError):
        make_spike_fn("nope")


def test_jittable_and_batched():
    f = jax.jit(jax.vmap(jax.grad(spike_atan)))
    out = f(jnp.zeros((8,)))
    np.testing.assert_allclose(np.asarray(out), np.ones(8))
