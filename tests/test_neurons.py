"""Tests for IF/LIF/PLIF cell dynamics, including a torch-autograd cross-check.

The torch reference below re-implements the *documented* SpikingJelly
clock-driven dynamics (charge -> surrogate fire -> hard reset with
detach_reset) independently, so multi-step BPTT gradients of our functional
JAX cells can be verified against a second autograd system.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stereospike_tpu.snn.neurons import (
    if_step,
    integrator_step,
    lif_step,
    plif_step,
    plif_tau_from_w,
    plif_w_from_tau,
)


# ---------------------------------------------------------------- torch oracle
class _ATanSpike(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, alpha):
        ctx.save_for_backward(x)
        ctx.alpha = alpha
        return (x >= 0).to(x)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        a = ctx.alpha
        return g * a / (2 * (1 + (math.pi / 2 * a * x) ** 2)), None


def _torch_run(x_seq, mode="if", tau=2.0, v_th=1.0, v_reset=0.0, detach_reset=True,
               alpha=2.0):
    """Run T steps of the documented dynamics in torch; return spikes, final v."""
    v = torch.zeros_like(x_seq[0])
    spikes = []
    for x in x_seq:
        if mode == "if":
            h = v + x
        elif mode == "lif":
            h = v + (x - (v - v_reset)) / tau
        else:
            raise ValueError(mode)
        s = _ATanSpike.apply(h - v_th, alpha)
        s_d = s.detach() if detach_reset else s
        v = (1 - s_d) * h + s_d * v_reset
        spikes.append(s)
    return spikes, v


def _jax_run(x_seq, mode="if", tau=2.0, detach_reset=True):
    def scan_fn(v, x):
        if mode == "if":
            v, s = if_step(v, x, detach_reset=detach_reset)
        else:
            v, s = lif_step(v, x, tau=tau, detach_reset=detach_reset)
        return v, s

    v0 = jnp.zeros_like(x_seq[0])
    v, spikes = jax.lax.scan(scan_fn, v0, x_seq)
    return spikes, v


# ---------------------------------------------------------------- value tests
def test_if_single_step_values():
    # v=0, x below/at/above threshold 1.0
    v, s = if_step(jnp.zeros(3), jnp.array([0.5, 1.0, 2.3]))
    np.testing.assert_array_equal(np.asarray(s), [0.0, 1.0, 1.0])
    # no spike: v=h; spike: hard reset to 0
    np.testing.assert_allclose(np.asarray(v), [0.5, 0.0, 0.0])


def test_if_subthreshold_accumulates():
    v = jnp.zeros(())
    for _ in range(3):
        v, s = if_step(v, jnp.asarray(0.4))
    # 0.4 + 0.4 = 0.8 < 1.0 then 1.2 >= 1.0 -> fires and resets
    assert float(s) == 1.0 and float(v) == 0.0


def test_if_soft_reset():
    v, s = if_step(jnp.zeros(()), jnp.asarray(2.5), v_reset=None)
    assert float(s) == 1.0
    np.testing.assert_allclose(float(v), 1.5)  # h - v_th


def test_lif_charge():
    # v=0, v_reset=0: h = x / tau
    v, s = lif_step(jnp.zeros(()), jnp.asarray(3.0), tau=3.0)
    assert float(s) == 1.0 and float(v) == 0.0
    v, s = lif_step(jnp.zeros(()), jnp.asarray(2.9), tau=3.0)
    assert float(s) == 0.0
    np.testing.assert_allclose(float(v), 2.9 / 3.0, rtol=1e-6)


def test_plif_matches_lif_at_init():
    w = plif_w_from_tau(3.0)
    np.testing.assert_allclose(float(plif_tau_from_w(w)), 3.0, rtol=1e-6)
    x = jnp.array([0.7, 2.2, 3.1])
    v_l, s_l = lif_step(jnp.zeros(3), x, tau=3.0)
    v_p, s_p = plif_step(jnp.zeros(3), x, w)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_l), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_l))


def test_integrator_accumulates_and_never_fires():
    v = jnp.zeros(())
    for x in [5.0, -2.0, 100.0]:
        v = integrator_step(v, jnp.asarray(x))
    np.testing.assert_allclose(float(v), 103.0)


# ------------------------------------------------------------- gradient tests
@pytest.mark.parametrize("mode", ["if", "lif"])
@pytest.mark.parametrize("detach_reset", [True, False])
def test_bptt_gradients_match_torch(mode, detach_reset):
    rng = np.random.default_rng(0)
    T, N = 4, 16
    x_np = rng.normal(0.8, 0.8, size=(T, N)).astype(np.float32)

    # torch
    xt = torch.tensor(x_np, requires_grad=True)
    spikes_t, v_t = _torch_run(list(xt), mode=mode, tau=2.0,
                               detach_reset=detach_reset)
    loss_t = sum((s * w).sum() for s, w in
                 zip(spikes_t, torch.arange(1.0, T + 1))) + (v_t ** 2).sum()
    loss_t.backward()

    # jax
    def loss_fn(x):
        spikes, v = _jax_run(x, mode=mode, tau=2.0, detach_reset=detach_reset)
        weights = jnp.arange(1.0, T + 1)[:, None]
        return jnp.sum(spikes * weights) + jnp.sum(v ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(x_np))

    np.testing.assert_allclose(float(loss_t.detach()),
                               float(loss_fn(jnp.asarray(x_np))), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_plif_w_gradient_flows():
    w = plif_w_from_tau(3.0)
    x = jnp.linspace(0.0, 3.0, 8)

    def loss_fn(w):
        v, s = plif_step(jnp.zeros(8), x, w)
        return jnp.sum(v) + jnp.sum(s)

    g = jax.grad(loss_fn)(w)
    assert np.isfinite(float(g)) and float(g) != 0.0
