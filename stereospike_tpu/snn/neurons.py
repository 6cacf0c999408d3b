"""Functional spiking-neuron cell dynamics.

TPU-native replacement for SpikingJelly ``clock_driven.neuron`` (IFNode,
LIFNode, ParametricLIFNode, and the infinite-threshold "I-neuron" integrator
used as depth accumulator at ``/root/reference/network/SNN_models.py:150``).

Unlike the reference's stateful modules that mutate ``m.v`` in place, membrane
potential here is an explicit value threaded through the computation — a
``lax.scan`` carry for multi-timestep runs, and "reset_net" is simply
constructing a fresh zero state.

Shared step semantics (hard reset, matching SpikingJelly with
``v_reset = 0.0``):

    h       = charge(v, x)                        # neuron-specific
    spike   = spike_fn(h - v_threshold)           # surrogate-grad Heaviside
    spike_d = stop_gradient(spike) if detach_reset else spike
    v_next  = (1 - spike_d) * h + spike_d * v_reset

With ``v_reset=None`` the reset is "soft": ``v_next = h - spike_d * v_threshold``.

Charge functions:

- IF:    h = v + x
- LIF:   h = v + (x - (v - v_reset)) / tau
- PLIF:  h = v + (x - (v - v_reset)) * sigmoid(w),  w learnable,
         w0 = -log(tau0 - 1) so that sigmoid(w0) = 1/tau0
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from stereospike_tpu.snn.surrogate import spike_atan

Array = jax.Array
SpikeFn = Callable[[Array], Array]


def _fire_and_reset(
    h: Array,
    v_threshold: float,
    v_reset: Optional[float],
    spike_fn: SpikeFn,
    detach_reset: bool,
) -> Tuple[Array, Array]:
    spike = spike_fn(h - v_threshold)
    spike_d = jax.lax.stop_gradient(spike) if detach_reset else spike
    if v_reset is None:
        v_next = h - spike_d * v_threshold
    else:
        v_next = (1.0 - spike_d) * h + spike_d * v_reset
    return v_next, spike


def if_step(
    v: Array,
    x: Array,
    *,
    v_threshold: float = 1.0,
    v_reset: Optional[float] = 0.0,
    spike_fn: SpikeFn = spike_atan,
    detach_reset: bool = True,
) -> Tuple[Array, Array]:
    """One integrate-and-fire step. Returns (v_next, spike)."""
    h = v + x
    return _fire_and_reset(h, v_threshold, v_reset, spike_fn, detach_reset)


def lif_step(
    v: Array,
    x: Array,
    *,
    tau: float = 2.0,
    v_threshold: float = 1.0,
    v_reset: Optional[float] = 0.0,
    spike_fn: SpikeFn = spike_atan,
    detach_reset: bool = True,
) -> Tuple[Array, Array]:
    """One leaky integrate-and-fire step. Returns (v_next, spike)."""
    rest = 0.0 if v_reset is None else v_reset
    h = v + (x - (v - rest)) / tau
    return _fire_and_reset(h, v_threshold, v_reset, spike_fn, detach_reset)


def plif_w_from_tau(tau: float) -> jnp.ndarray:
    """Initial PLIF raw parameter w such that sigmoid(w) = 1/tau."""
    return jnp.asarray(-jnp.log(tau - 1.0), dtype=jnp.float32)


def plif_tau_from_w(w: Array) -> Array:
    """Effective tau = 1 / sigmoid(w) of a PLIF raw parameter."""
    return 1.0 / jax.nn.sigmoid(w)


def plif_step(
    v: Array,
    x: Array,
    w: Array,
    *,
    v_threshold: float = 1.0,
    v_reset: Optional[float] = 0.0,
    spike_fn: SpikeFn = spike_atan,
    detach_reset: bool = True,
) -> Tuple[Array, Array]:
    """One parametric-LIF step; ``w`` is the learnable raw leak (scalar).

    Membrane decay factor is ``sigmoid(w)`` = 1/tau, learned by gradient
    descent (SpikingJelly ParametricLIFNode semantics).
    """
    rest = 0.0 if v_reset is None else v_reset
    h = v + (x - (v - rest)) * jax.nn.sigmoid(w)
    return _fire_and_reset(h, v_threshold, v_reset, spike_fn, detach_reset)


def integrator_step(v: Array, x: Array) -> Array:
    """Non-firing integrator ("I-neuron", v_threshold = inf): v_next = v + x.

    The accumulated potential *is* the model output (depth map) — reference
    ``SNN_models.py:150,172-188``. Never fires, so no surrogate is involved;
    gradients flow straight through the sum.
    """
    return v + x
