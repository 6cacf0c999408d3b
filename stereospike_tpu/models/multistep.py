"""Layer-major multi-timestep forward (the TPU "multi-step mode").

``forward_sequence`` (step-major ``lax.scan``) runs the whole network once
per timestep. StereoSpike's graph is feedforward — no layer consumes a
later layer's output — so the network can equivalently run **layer-major**:
each layer processes all T timesteps before the next layer starts. That is
the execution model behind SpikingJelly's CUDA multi-step neurons (the
reference stack's native fast path); here it becomes:

- every conv batches over B·T merged samples (bigger MXU matmuls), and
- each neuron site runs ONE fused Pallas kernel over its T-step recurrence
  (membrane potential stays in VMEM; see ``snn/pallas_kernels.py``), with
  the pure-jnp scan as fallback/oracle.

Outputs match ``forward_sequence`` (last-step depths/spikes + final state);
the depth-integrator pool accumulates over heads within a step and across
steps exactly as the shared I-neurons do (``SNN_models.py:170-188``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stereospike_tpu.models.stereospike import StereoSpikeConfig, init_state
from stereospike_tpu.nn.blocks import connect, conv_scale, upsample_conv_scale
from stereospike_tpu.snn.neurons import plif_tau_from_w  # noqa: F401  (docs)
from stereospike_tpu.snn.pallas_kernels import (
    multistep_fire,
    multistep_fire_reference,
)

Array = jax.Array


def _leak_for(site: str, params: Dict, cfg: StereoSpikeConfig):
    kind = cfg.effective_sew_neuron if site.startswith("sew") else cfg.neuron
    if kind == "if":
        return jnp.asarray(0.0, jnp.float32), False, True
    if kind == "lif":
        return jnp.asarray(1.0 / cfg.tau, jnp.float32), False, False
    return jax.nn.sigmoid(params["plif"][site]), True, False


def forward_multistep(
    params: Dict,
    frames: Array,
    cfg: StereoSpikeConfig,
    state: Optional[Dict] = None,
    *,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
):
    """``frames`` [B, T, H, W, C] → (depths, spikes, final_state), matching
    ``forward_sequence``'s last-step outputs.

    ``use_pallas=None`` auto-selects: fused kernels on TPU backends, the
    pure-jnp scan elsewhere (CPU tests/fallback).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    B, T = frames.shape[:2]
    if state is None:
        state = init_state(cfg, B, frames.dtype)
    new_state: Dict = {}
    ms = cfg.multiply_factor if not cfg.learnable_multiply else 1.0
    sizes = cfg.sizes

    def fire(site: str, x_tb: Array) -> Array:
        """x_tb: [T·B, h, w, c] charges (T-major merge) → spikes.

        Everything inside the layer-major forward stays T-major so the
        [T·B, ...] ↔ [T, B·h·w·c] reshapes around convs and kernels are
        free (no transposes — the data layout never changes)."""
        tb, h, w, c = x_tb.shape
        leak, is_plif, is_if = _leak_for(site, params, cfg)
        sur = cfg.sew_surrogate if site.startswith("sew") else cfg.surrogate
        alpha_cfg = (cfg.sew_surrogate_alpha if site.startswith("sew")
                     else cfg.surrogate_alpha)
        alpha = (2.0 if sur == "atan" else 4.0) if alpha_cfg is None else alpha_cfg
        x_t = x_tb.reshape(T, -1)
        v0 = state[site].astype(x_tb.dtype).reshape(-1)
        fn = multistep_fire if use_pallas else multistep_fire_reference
        kw = dict() if not use_pallas else dict(interpret=interpret, is_if=is_if)
        spikes, vT = fn(x_t, v0, leak.astype(x_tb.dtype),
                        cfg.v_threshold, 0.0 if cfg.v_reset is None else cfg.v_reset,
                        sur, alpha, is_plif, **kw)
        new_state[site] = vT.reshape(state[site].shape)
        return spikes.reshape(tb, h, w, c)

    # one transpose in: [B, T, ...] → [T·B, ...]; all internal layouts T-major
    x = jnp.swapaxes(frames, 0, 1).reshape((T * B,) + frames.shape[2:])

    out_bottom = fire("bottom", conv_scale(x, params["bottom"], stride=1,
                                           padding=2, static_scale=ms))
    out_conv1 = fire("conv1", conv_scale(out_bottom, params["conv1"], stride=2,
                                         padding=2, static_scale=ms))
    out_conv2 = fire("conv2", conv_scale(out_conv1, params["conv2"], stride=2,
                                         padding=2, static_scale=ms))
    out_conv3 = fire("conv3", conv_scale(out_conv2, params["conv3"], stride=2,
                                         padding=2, static_scale=ms))
    out_conv4 = fire("conv4", conv_scale(out_conv3, params["conv4"], stride=2,
                                         padding=2, static_scale=ms))

    def sew(block: str, x_in: Array) -> Array:
        out = fire(f"{block}_a", conv_scale(x_in, params[block]["conv1"],
                                            stride=1, padding=1, static_scale=ms))
        out = fire(f"{block}_b", conv_scale(out, params[block]["conv2"],
                                            stride=1, padding=1, static_scale=ms))
        return connect(out, x_in, cfg.connect_fn)

    out_rconv = sew("sew2", sew("sew1", out_conv4))

    skips = (out_bottom, out_conv1, out_conv2, out_conv3)
    charges: Dict[int, Array] = {}
    spikes_last = [out_rconv.reshape((T, B) + out_rconv.shape[1:])[-1]]

    xdec = out_rconv
    for scale in (4, 3, 2, 1):
        xdec = fire(f"deconv{scale}", upsample_conv_scale(
            xdec, params[f"deconv{scale}"], target_hw=sizes[scale - 1],
            static_scale=ms))
        if cfg.use_skips:
            xdec = xdec + skips[scale - 1]
        spikes_last.append(xdec.reshape((T, B) + xdec.shape[1:])[-1])
        if scale in cfg.heads:
            ch = upsample_conv_scale(xdec, params[f"pred{scale}"],
                                     target_hw=sizes[0], static_scale=ms)
            charges[scale] = ch.reshape((T, B) + ch.shape[1:])

    # depth-integrator pool: within step t heads charge in order 4→1, and
    # the potential carries across steps. Last-step depth_k therefore is
    # v0 + all charges from steps < T-1 + charges of heads ≥ k at step T-1.
    head_order = sorted(cfg.heads, reverse=True)
    v0_depth = state["Ineurons"].astype(frames.dtype)
    prefix = v0_depth
    if T > 1:
        prefix = prefix + sum(
            jnp.sum(charges[s][: T - 1], axis=0) for s in head_order)
    depths_by_scale: Dict[int, Array] = {}
    running = prefix
    for s in head_order:
        running = running + charges[s][T - 1]
        depths_by_scale[s] = running
    new_state["Ineurons"] = running

    depths = [depths_by_scale[s] for s in sorted(cfg.heads)]
    return depths, spikes_last, new_state
