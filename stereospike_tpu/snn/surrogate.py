"""Surrogate-gradient spike functions.

TPU-native replacement for SpikingJelly's ``clock_driven.surrogate`` autograd
ops (the reference's de-facto native layer; used at
``/root/reference/train.py:118`` with ATan and throughout
``/root/reference/network/SNN_models.py``).

Forward: Heaviside step ``spike = 1[x >= 0]`` (SpikingJelly's heaviside fires
at exactly 0 too). Backward: a smooth pseudo-derivative. Implemented with
``jax.custom_jvp`` so the same definition serves ``jax.grad``, ``jax.vjp``
and forward-mode (the JVP is linear in the tangent, so XLA can transpose it).

Pseudo-derivatives match SpikingJelly's definitions:

- ATan (default ``alpha = 2.0``):
      d/dx = alpha / (2 * (1 + (pi/2 * alpha * x)^2))
- Sigmoid (default ``alpha = 4.0``), with s = sigmoid(alpha * x):
      d/dx = alpha * s * (1 - s)
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

_HALF_PI = math.pi / 2.0


def _heaviside(x: Array) -> Array:
    """Heaviside step with H(0) = 1, in the input dtype (0./1. spikes)."""
    x = jnp.asarray(x)
    return (x >= 0).astype(x.dtype)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def spike_atan(x: Array, alpha: float = 2.0) -> Array:
    """Heaviside spike with arctan surrogate gradient (SpikingJelly ATan)."""
    return _heaviside(x)


@spike_atan.defjvp
def _spike_atan_jvp(alpha, primals, tangents):
    (x,), (dx,) = primals, tangents
    y = _heaviside(x)
    s = _HALF_PI * alpha * x
    dydx = alpha / (2.0 * (1.0 + s * s))
    return y, dydx * dx


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def spike_sigmoid(x: Array, alpha: float = 4.0) -> Array:
    """Heaviside spike with sigmoid surrogate gradient (SpikingJelly Sigmoid)."""
    return _heaviside(x)


@spike_sigmoid.defjvp
def _spike_sigmoid_jvp(alpha, primals, tangents):
    (x,), (dx,) = primals, tangents
    y = _heaviside(x)
    s = jax.nn.sigmoid(alpha * x)
    dydx = alpha * s * (1.0 - s)
    return y, dydx * dx


def make_spike_fn(name: str = "atan", alpha: float | None = None) -> Callable[[Array], Array]:
    """Build a spike function by name ('atan' | 'sigmoid') with optional alpha."""
    if name == "atan":
        a = 2.0 if alpha is None else alpha
        return lambda x: spike_atan(x, a)
    if name == "sigmoid":
        a = 4.0 if alpha is None else alpha
        return lambda x: spike_sigmoid(x, a)
    raise ValueError(f"unknown surrogate '{name}' (expected 'atan' or 'sigmoid')")
