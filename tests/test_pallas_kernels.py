"""Parity tests: Pallas multi-timestep neuron kernel vs the pure-jnp scan
oracle (forward values and BPTT gradients), run in interpret mode on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.snn.pallas_kernels import (
    multistep_fire,
    multistep_fire_reference,
)


def _data(T=5, M=1000, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (T, M)) * 1.2 + 0.6
    v0 = jax.random.uniform(k2, (M,)) * 0.5
    return x, v0


@pytest.mark.parametrize("leak", [0.0, 1.0 / 3.0])
@pytest.mark.parametrize("T", [1, 5])
def test_forward_matches_reference(leak, T):
    x, v0 = _data(T=T)
    leak_a = jnp.asarray(leak)
    s_k, v_k = multistep_fire(x, v0, leak_a, interpret=True,
                              is_if=(leak == 0.0))
    s_r, v_r = multistep_fire_reference(x, v0, leak_a)
    np.testing.assert_array_equal(np.asarray(s_k), np.asarray(s_r))
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("surrogate,alpha", [("atan", 2.0), ("sigmoid", 4.0)])
@pytest.mark.parametrize("leak", [0.0, 0.25])
def test_gradients_match_reference(surrogate, alpha, leak):
    x, v0 = _data(T=4, M=512, seed=1)
    leak_a = jnp.asarray(leak)
    w_t = jnp.arange(1.0, 5.0)[:, None]

    def loss_k(x, v0):
        s, vT = multistep_fire(x, v0, leak_a, 1.0, 0.0, surrogate, alpha,
                               False, True, leak == 0.0)
        return jnp.sum(s * w_t) + jnp.sum(vT ** 2)

    def loss_r(x, v0):
        s, vT = multistep_fire_reference(x, v0, leak_a, 1.0, 0.0,
                                         surrogate, alpha)
        return jnp.sum(s * w_t) + jnp.sum(vT ** 2)

    np.testing.assert_allclose(float(loss_k(x, v0)), float(loss_r(x, v0)),
                               rtol=1e-5)
    gk = jax.grad(loss_k, argnums=(0, 1))(x, v0)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, v0)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_plif_leak_gradient_matches_reference():
    x, v0 = _data(T=4, M=256, seed=2)

    def loss_k(w):
        leak = jax.nn.sigmoid(w)
        s, vT = multistep_fire(x, v0, leak, 1.0, 0.0, "atan", 2.0, True, True)
        return jnp.sum(s) + jnp.sum(vT ** 2)

    def loss_r(w):
        leak = jax.nn.sigmoid(w)
        s, vT = multistep_fire_reference(x, v0, leak, 1.0, 0.0, "atan", 2.0)
        return jnp.sum(s) + jnp.sum(vT ** 2)

    w = jnp.asarray(-0.6931)  # tau = 3
    np.testing.assert_allclose(float(loss_k(w)), float(loss_r(w)), rtol=1e-5)
    np.testing.assert_allclose(float(jax.grad(loss_k)(w)),
                               float(jax.grad(loss_r)(w)), rtol=1e-4)


def test_padding_path():
    # M deliberately not a multiple of the tile
    x, v0 = _data(T=3, M=7000, seed=3)
    s_k, v_k = multistep_fire(x, v0, jnp.asarray(0.0), interpret=True,
                              is_if=True)
    s_r, v_r = multistep_fire_reference(x, v0, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(s_k), np.asarray(s_r))
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r), rtol=1e-6)


@pytest.mark.parametrize("tau", [1.0, 1.0 + 1e-6, 1.0005])
def test_plif_gradient_finite_at_leak_one(tau):
    """leak = sigmoid(w) → 1 (tau → 1): the old backward inverted the charge
    as (h − leak·x)/(1 − leak), dividing by zero. v_prev now comes from the
    replay scratch, so the gradient must stay finite and match the oracle."""
    x, v0 = _data(T=4, M=256, seed=5)
    leak = jnp.asarray(1.0 / tau, jnp.float32)

    def loss_k(x, v0, leak):
        s, vT = multistep_fire(x, v0, leak, 1.0, 0.0, "atan", 2.0, True, True)
        return jnp.sum(s) + jnp.sum(vT ** 2)

    def loss_r(x, v0, leak):
        s, vT = multistep_fire_reference(x, v0, leak, 1.0, 0.0, "atan", 2.0)
        return jnp.sum(s) + jnp.sum(vT ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, v0, leak)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, v0, leak)
    for a, b in zip(gk, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_boundary_shapes_long_t_and_small_m():
    # huge T and M < 128 (single partial lane tile)
    for T, M in ((32, 96), (2, 50)):
        x, v0 = _data(T=T, M=M, seed=6)
        leak = jnp.asarray(0.5)
        s_k, v_k = multistep_fire(x, v0, leak, 1.0, 0.0, "atan", 2.0, True,
                                  True)
        s_r, v_r = multistep_fire_reference(x, v0, leak)
        np.testing.assert_array_equal(np.asarray(s_k), np.asarray(s_r))
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r),
                                   rtol=1e-5, atol=1e-6)


def test_matches_stepwise_neuron_cells():
    """Kernel semantics == the step-major cells in snn.neurons."""
    from stereospike_tpu.snn.neurons import lif_step

    x, v0 = _data(T=6, M=128, seed=4)
    s_k, v_k = multistep_fire(x, v0, jnp.asarray(1.0 / 3.0), interpret=True)

    def scan_fn(v, xt):
        v2, s = lif_step(v, xt, tau=3.0)
        return v2, s

    vT, spikes = jax.lax.scan(scan_fn, v0, x)
    np.testing.assert_array_equal(np.asarray(s_k), np.asarray(spikes))
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(vT),
                               rtol=1e-5, atol=1e-6)
