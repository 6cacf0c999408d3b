"""Reusable network blocks (functional init/apply pairs).

TPU-native counterparts of reference ``network/blocks.py``:

- conv block   = conv(k5) → MultiplyBy → spiking neuron   (``SNN_models.py:75-79``)
- upsample blk = NNConvUpsampling → MultiplyBy → neuron   (``SNN_models.py:110-129``)
- SEW residual = [conv3 → ×c → fire] ×2, connect with identity (``blocks.py:135-181``)
- ANN residual = [conv3 → act → BN] ×2 + identity          (``blocks.py:40-83``)
- ``connect``  = spike-element-wise combine (ADD/MUL/AND/OR/NMUL)

MultiplyBy (``blocks.py:90-107``) is a scalar scale fighting vanishing
spikes; here it's either a static config constant (fused into the conv by
XLA) or a learnable scalar parameter.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from stereospike_tpu.nn.layers import conv2d, conv_init, upsample_conv

Array = jax.Array


def connect(out: Array, identity: Array, kind: str = "ADD") -> Array:
    """Spike-element-wise combine of a residual branch with its identity.

    'OR' uses the SEW paper's algebraic form a + b − a·b (the reference's OR
    branch is unused and degenerate — Heaviside of a non-negative sum).
    """
    if kind == "ADD":
        return out + identity
    if kind in ("MUL", "AND"):
        return out * identity
    if kind == "OR":
        return out + identity - out * identity
    if kind == "NMUL":
        return identity * (1.0 - out)
    raise NotImplementedError(f"unknown connect function '{kind}'")


def init_conv_block(key, k: int, c_in: int, c_out: int, *, bias: bool = False,
                    learnable_scale: Optional[float] = None) -> dict:
    """Params for conv(+bias) [+ learnable MultiplyBy scalar]."""
    p = conv_init(key, k, c_in, c_out, bias=bias)
    if learnable_scale is not None:
        p["scale"] = jnp.asarray([learnable_scale], dtype=jnp.float32)
    return p


init_upsample_block = init_conv_block  # same param structure (w [, b] [, scale])


def _apply_scale(x: Array, params: dict, static_scale: float) -> Array:
    if "scale" in params:
        return x * params["scale"]
    if static_scale != 1.0:
        return x * static_scale
    return x


def conv_scale(x: Array, params: dict, *, stride: int = 1, padding: int = 0,
               static_scale: float = 1.0) -> Array:
    """conv → MultiplyBy (pre-neuron charge of an SNN conv block)."""
    out = conv2d(x, params["w"], params.get("b"), stride=stride, padding=padding)
    return _apply_scale(out, params, static_scale)


def upsample_conv_scale(x: Array, params: dict, *, target_hw: Tuple[int, int],
                        static_scale: float = 1.0, mode: str = "nearest",
                        phase: bool = False, poly: bool = False) -> Array:
    """NNConvUpsampling → MultiplyBy (pre-neuron charge of a decoder block).
    ``phase`` opts into the phase-stacked inference form, ``poly`` into the
    polyphase route where the shape supports it (see
    ``layers.upsample_conv``)."""
    out = upsample_conv(x, params["w"], params.get("b"), target_hw=target_hw,
                        mode=mode, phase=phase, poly=poly)
    return _apply_scale(out, params, static_scale)


def init_sew_block(key, channels: int, *, learnable_scale: Optional[float] = None) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv_block(k1, 3, channels, channels, learnable_scale=learnable_scale),
        "conv2": init_conv_block(k2, 3, channels, channels, learnable_scale=learnable_scale),
    }


def sew_block_apply(
    params: dict,
    x: Array,
    fire1: Callable[[Array], Array],
    fire2: Callable[[Array], Array],
    *,
    static_scale: float = 1.0,
    connect_fn: str = "ADD",
) -> Array:
    """SEW residual block. ``fire*`` are neuron charge→spike closures
    (state handling is the caller's concern, keeping this block pure)."""
    identity = x
    out = conv_scale(x, params["conv1"], stride=1, padding=1, static_scale=static_scale)
    out = fire1(out)
    out = conv_scale(out, params["conv2"], stride=1, padding=1, static_scale=static_scale)
    out = fire2(out)
    return connect(out, identity, connect_fn)


# --------------------------------------------------------------- ANN blocks
def init_batchnorm(channels: int) -> dict:
    return {
        "gamma": jnp.ones((channels,), jnp.float32),
        "beta": jnp.zeros((channels,), jnp.float32),
    }


def batchnorm_apply(params: dict, x: Array, *, state: dict, train: bool,
                    momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm2d over NHWC (torch semantics: biased batch var for
    normalization, unbiased for the running estimate). Returns (y, new_state)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["gamma"] + params["beta"]
    return y, new_state


def init_bn_state(channels: int) -> dict:
    return {"mean": jnp.zeros((channels,), jnp.float32),
            "var": jnp.ones((channels,), jnp.float32)}


def init_ann_res_block(key, channels: int, *, bias: bool = True) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_init(k1, 3, channels, channels, bias=bias),
        "bn1": init_batchnorm(channels),
        "conv2": conv_init(k2, 3, channels, channels, bias=bias),
        "bn2": init_batchnorm(channels),
    }


def ann_res_block_apply(params: dict, x: Array, act: Callable[[Array], Array],
                        *, bn_state: dict, train: bool, connect_fn: str = "ADD"):
    """ANN residual block: [conv3 → act → BN] ×2 then connect with identity.
    Returns (y, new_bn_state)."""
    identity = x
    out = conv2d(x, params["conv1"]["w"], params["conv1"].get("b"), stride=1, padding=1)
    out, s1 = batchnorm_apply(params["bn1"], act(out), state=bn_state["bn1"], train=train)
    out = conv2d(out, params["conv2"]["w"], params["conv2"].get("b"), stride=1, padding=1)
    out, s2 = batchnorm_apply(params["bn2"], act(out), state=bn_state["bn2"], train=train)
    return connect(out, identity, connect_fn), {"bn1": s1, "bn2": s2}
