"""Equivalent ANN baseline: same U-Net topology, analog activations + BN.

Reference ``network/ANN_models.py:28-152`` (``StereoSpike_equivalentANN``):
conv layers have biases, each conv/deconv block is conv → activation →
BatchNorm2d, bottleneck is two standard residual blocks, and the cumulative
infinite-threshold integrator output pool is kept. Paper Table 4 compares
Sigmoid/Tanh/LeakyReLU activations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stereospike_tpu.models.stereospike import StereoSpikeConfig
from stereospike_tpu.nn.blocks import (
    ann_res_block_apply,
    batchnorm_apply,
    init_ann_res_block,
    init_batchnorm,
    init_bn_state,
)
from stereospike_tpu.nn.layers import conv2d, conv_init, upsample_conv
from stereospike_tpu.snn.neurons import integrator_step

Array = jax.Array

_ACTIVATIONS: Dict[str, Callable[[Array], Array]] = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "relu": jax.nn.relu,
}


@dataclasses.dataclass(frozen=True)
class AnnConfig:
    in_channels: int = 4
    base_channels: int = 32
    in_hw: Tuple[int, int] = (260, 346)
    activation: str = "sigmoid"

    @property
    def skeleton(self) -> StereoSpikeConfig:
        return StereoSpikeConfig(
            in_channels=self.in_channels,
            base_channels=self.base_channels,
            in_hw=self.in_hw,
        )


def init_ann_params(key: Array, cfg: AnnConfig) -> Dict:
    sk = cfg.skeleton
    c = sk.channels
    keys = jax.random.split(key, 16)
    params: Dict = {
        "bottom": conv_init(keys[0], 5, cfg.in_channels, c[0], bias=True),
        "bn_bottom": init_batchnorm(c[0]),
    }
    for i, (ci, co) in enumerate(zip(c[:-1], c[1:]), start=1):
        params[f"conv{i}"] = conv_init(keys[i], 5, ci, co, bias=True)
        params[f"bn_conv{i}"] = init_batchnorm(co)
    params["res1"] = init_ann_res_block(keys[5], c[4], bias=True)
    params["res2"] = init_ann_res_block(keys[6], c[4], bias=True)
    for i, (ci, co) in enumerate(zip(c[1:][::-1], c[:-1][::-1])):
        s = 4 - i  # deconv4..deconv1
        params[f"deconv{s}"] = conv_init(keys[7 + i], 5, ci, co, bias=False)
        params[f"bn_deconv{s}"] = init_batchnorm(co)
    for i, s in enumerate((1, 2, 3, 4)):
        params[f"pred{s}"] = conv_init(keys[11 + i], 3, c[s - 1], 1, bias=True)
    return params


def init_ann_state(cfg: AnnConfig) -> Dict:
    sk = cfg.skeleton
    c = sk.channels
    state: Dict = {"bn_bottom": init_bn_state(c[0])}
    for i in range(1, 5):
        state[f"bn_conv{i}"] = init_bn_state(c[i])
    state["res1"] = {"bn1": init_bn_state(c[4]), "bn2": init_bn_state(c[4])}
    state["res2"] = {"bn1": init_bn_state(c[4]), "bn2": init_bn_state(c[4])}
    for s in (4, 3, 2, 1):
        state[f"bn_deconv{s}"] = init_bn_state(c[s - 1])
    return state


def ann_forward(
    params: Dict,
    frame: Array,
    cfg: AnnConfig,
    state: Dict,
    *,
    train: bool = False,
    init_depth: Optional[Array] = None,
):
    """Returns ``([depth1..depth4], new_bn_state)``; depths are cumulative
    through the shared integrator pool exactly as in the SNN."""
    act = _ACTIVATIONS[cfg.activation]
    sk = cfg.skeleton
    sizes = sk.sizes
    new_state: Dict = {}

    def conv_act_bn(name: str, x: Array, *, stride: int) -> Array:
        out = conv2d(x, params[name]["w"], params[name].get("b"),
                     stride=stride, padding=2)
        out, new_state[f"bn_{name}"] = batchnorm_apply(
            params[f"bn_{name}"], act(out), state=state[f"bn_{name}"], train=train)
        return out

    out_bottom = conv_act_bn("bottom", frame, stride=1)
    out_conv1 = conv_act_bn("conv1", out_bottom, stride=2)
    out_conv2 = conv_act_bn("conv2", out_conv1, stride=2)
    out_conv3 = conv_act_bn("conv3", out_conv2, stride=2)
    out_conv4 = conv_act_bn("conv4", out_conv3, stride=2)

    out, new_state["res1"] = ann_res_block_apply(
        params["res1"], out_conv4, act, bn_state=state["res1"], train=train)
    out_rconv, new_state["res2"] = ann_res_block_apply(
        params["res2"], out, act, bn_state=state["res2"], train=train)

    v_depth = (jnp.zeros(frame.shape[:1] + sizes[0] + (1,), frame.dtype)
               if init_depth is None else init_depth)
    skips = (out_bottom, out_conv1, out_conv2, out_conv3)
    depths: Dict[int, Array] = {}
    x = out_rconv
    for scale in (4, 3, 2, 1):
        name = f"deconv{scale}"
        up = upsample_conv(x, params[name]["w"], params[name].get("b"),
                           target_hw=sizes[scale - 1])
        up, new_state[f"bn_{name}"] = batchnorm_apply(
            params[f"bn_{name}"], act(up), state=state[f"bn_{name}"], train=train)
        x = up + skips[scale - 1]
        charge = upsample_conv(x, params[f"pred{scale}"]["w"],
                               params[f"pred{scale}"].get("b"), target_hw=sizes[0])
        v_depth = integrator_step(v_depth, charge)
        depths[scale] = v_depth

    return [depths[1], depths[2], depths[3], depths[4]], new_state
