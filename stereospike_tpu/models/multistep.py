"""Layer-major multi-timestep forward (the TPU "multi-step mode").

``forward_sequence`` (step-major ``lax.scan``) runs the whole network once
per timestep. StereoSpike's graph is feedforward — no layer consumes a
later layer's output — so the network can equivalently run **layer-major**:
each layer processes all T timesteps before the next layer starts. That is
the execution model behind SpikingJelly's CUDA multi-step neurons (the
reference stack's native fast path); here it becomes:

- every conv batches over B·T merged samples (bigger MXU matmuls — measured
  ~1.4× faster than the per-step convs of the scan on a v5e), and
- each neuron site runs its T-step recurrence layer-locally, in one of two
  implementations selected by ``use_pallas``:

  * default (False): a statically unrolled recurrence in the conv's NATIVE
    [T·B, h, w, c] layout — slicing the leading axis is layout-free, so XLA
    fuses each step's charge→fire→reset chain into the neighbouring conv
    fusions with ZERO extra HBM round-trips. Measured fastest on TPU.
  * ``use_pallas=True``: the fused Pallas kernel (``snn/pallas_kernels.py``,
    membrane potential resident in VMEM across all T steps). The kernel
    itself streams at ~350 GB/s, but it is an opaque custom call, so XLA
    must materialize [T·B,h,w,c] ↔ [T,M] relayout copies around every site
    (~3× the kernel's own time at T=5) — kept for long-T regimes where an
    unrolled chain bloats the HLO, and as a second independent
    implementation for parity testing.

Outputs match ``forward_sequence`` (last-step depths/spikes + final state);
the depth-integrator pool accumulates over heads within a step and across
steps exactly as the shared I-neurons do (``SNN_models.py:170-188``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stereospike_tpu.models.stereospike import StereoSpikeConfig, init_state
from stereospike_tpu.nn.blocks import (
    _apply_scale,
    connect,
    conv_scale,
    upsample_conv_scale,
)
from stereospike_tpu.nn.layers import (
    _upsample_conv_1out_s2d,
    _upsample_conv_1out_s2d_conv,
    conv2d_s2d,
    depth_to_space,
    space_to_depth,
    upsample_conv_s2d_out,
)
from stereospike_tpu.snn.neurons import if_step, lif_step, plif_step
from stereospike_tpu.snn.pallas_kernels import multistep_fire
from stereospike_tpu.snn.surrogate import make_spike_fn

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

    ``use_pallas``: False/None (default) runs each site's recurrence as a
    statically unrolled chain in the conv's native layout (the measured fast
    path — see module docstring); True routes every site through the fused
    Pallas VMEM kernel.
    """
    use_pallas = bool(use_pallas)
    if use_pallas:
        # the fused kernels implement exactly the default semantics (hard
        # reset to 0, detached reset, charge h = v + (x-v)·leak); other
        # configs would silently diverge from forward_sequence — refuse.
        # The unrolled path reuses the snn.neurons cells and supports all
        # configurations.
        if not cfg.detach_reset:
            raise NotImplementedError(
                "use_pallas=True requires detach_reset=True (the kernel "
                "always detaches the reset); use the default unrolled path")
        if cfg.v_reset != 0.0:
            raise NotImplementedError(
                f"use_pallas=True requires v_reset=0.0, got {cfg.v_reset!r} "
                "(the kernel's hard reset and LIF/PLIF charge assume a zero "
                "rest potential); use the default unrolled path")
    B, T = frames.shape[:2]
    if state is None:
        state = init_state(cfg, B, frames.dtype)
    new_state: Dict = {}
    ms = cfg.multiply_factor if not cfg.learnable_multiply else 1.0
    sizes = cfg.sizes

    spike_enc = make_spike_fn(cfg.surrogate, cfg.surrogate_alpha)
    spike_sew = make_spike_fn(cfg.sew_surrogate, cfg.sew_surrogate_alpha)

    def step_slice(a: Array, t: int) -> Array:
        """Step t's [B, ...] slab of a T-major [T·B, ...] tensor.

        A leading-axis slice (never a [T, B, ...] reshape): XLA assigns the
        5-D reshape/stack forms their own layouts — measured on the v5e, it
        picked B-in-lanes layouts with up to 4.9× pad expansion and inserted
        physical copies around every neuron site, which both blew the HBM
        budget (T=5 B=26 OOM'd at 16.1 G) and serialized the recurrence on
        copy traffic. Slices of the conv's own [T·B, h, w, c] layout are
        layout-preserving, so none of that exists."""
        return jax.lax.slice_in_dim(a, t * B, (t + 1) * B, axis=0)

    def fire_unrolled(site: str, x_tb: Array) -> Array:
        """Statically unrolled T-step recurrence in the conv's own layout.

        Each step's charge→fire→reset is a fusable elementwise chain over a
        leading-axis slice of [T·B, h, w, c]; XLA folds the chain into the
        surrounding conv fusions. Reuses the exact snn.neurons cell
        semantics."""
        in_sew = site.startswith("sew")
        kind = cfg.effective_sew_neuron if in_sew else cfg.neuron
        kw = dict(v_threshold=cfg.v_threshold, v_reset=cfg.v_reset,
                  spike_fn=spike_sew if in_sew else spike_enc,
                  detach_reset=cfg.detach_reset)
        v = state[site].astype(x_tb.dtype)
        outs = []
        for t in range(T):
            x_t = step_slice(x_tb, t)
            if kind == "if":
                v, s_t = if_step(v, x_t, **kw)
            elif kind == "lif":
                v, s_t = lif_step(v, x_t, tau=cfg.tau, **kw)
            else:
                v, s_t = plif_step(v, x_t, params["plif"][site], **kw)
            outs.append(s_t)
        new_state[site] = v
        return outs[0] if T == 1 else jnp.concatenate(outs, axis=0)

    def fire_pallas(site: str, x_tb: Array) -> Array:
        """One fused VMEM kernel over the whole T-step recurrence
        (snn/pallas_kernels.py); pays [T·B,h,w,c] ↔ [T,M] relayouts at the
        custom-call boundary."""
        tb, h, w, c = x_tb.shape
        leak, is_plif, is_if = _leak_for(site, params, cfg)
        sur = cfg.sew_surrogate if site.startswith("sew") else cfg.surrogate
        alpha_cfg = (cfg.sew_surrogate_alpha if site.startswith("sew")
                     else cfg.surrogate_alpha)
        alpha = (2.0 if sur == "atan" else 4.0) if alpha_cfg is None else alpha_cfg
        x_t = x_tb.reshape(T, -1)
        v0 = state[site].astype(x_tb.dtype).reshape(-1)
        spikes, vT = multistep_fire(
            x_t, v0, leak.astype(x_tb.dtype), cfg.v_threshold,
            0.0 if cfg.v_reset is None else cfg.v_reset,
            sur, alpha, is_plif, interpret, is_if)
        new_state[site] = vT.reshape(state[site].shape)
        return spikes.reshape(tb, h, w, c)

    fire = fire_pallas if use_pallas else fire_unrolled

    # one transpose in: [B, T, ...] → [T·B, ...]; all internal layouts T-major
    x = jnp.swapaxes(frames, 0, 1).reshape((T * B,) + frames.shape[2:])

    use_s2d = cfg.use_s2d_level0
    if use_s2d:
        # s2d-canonical level 0 (models/stereospike.py forward): full-res
        # tensors as [T·B, H/2, W/2, 4C], expanded-kernel encoder convs,
        # phase deconv1 with no relayout
        x0 = space_to_depth(x)
        out_bottom = fire("bottom", _apply_scale(
            conv2d_s2d(x0, params["bottom"]["w"], params["bottom"].get("b"),
                       stride=1), params["bottom"], ms))
        out_conv1 = fire("conv1", _apply_scale(
            conv2d_s2d(out_bottom, params["conv1"]["w"],
                       params["conv1"].get("b"), stride=2),
            params["conv1"], ms))
    else:
        out_bottom = fire("bottom", conv_scale(x, params["bottom"], stride=1,
                                               padding=2, static_scale=ms))
        out_conv1 = fire("conv1", conv_scale(out_bottom, params["conv1"],
                                             stride=2, padding=2,
                                             static_scale=ms))
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
    spikes_last = [step_slice(out_rconv, T - 1)]

    xdec = out_rconv
    for scale in (4, 3, 2, 1):
        if scale == 1 and use_s2d:
            if cfg.poly_deconv1_at(xdec.shape[0]):
                from stereospike_tpu.nn.poly_route import upsample_conv_s2d_poly

                up1 = upsample_conv_s2d_poly(xdec, params["deconv1"]["w"],
                                             target_hw=sizes[0])
            else:
                up1 = upsample_conv_s2d_out(xdec, params["deconv1"]["w"],
                                            target_hw=sizes[0])
            xdec = fire("deconv1", _apply_scale(up1, params["deconv1"], ms))
        else:
            xdec = fire(f"deconv{scale}", upsample_conv_scale(
                xdec, params[f"deconv{scale}"], target_hw=sizes[scale - 1],
                static_scale=ms, phase=cfg.phase_upsample,
                poly=cfg.poly_inner_at(scale, xdec.shape[0])))
        if cfg.use_skips:
            xdec = xdec + skips[scale - 1]
        last = step_slice(xdec, T - 1)
        spikes_last.append(depth_to_space(last)
                           if scale == 1 and use_s2d else last)
        if scale in cfg.heads:
            if scale == 1 and use_s2d:
                head = (_upsample_conv_1out_s2d_conv if cfg.use_pred_s2d_conv
                        else _upsample_conv_1out_s2d)
                ch = _apply_scale(head(
                    xdec, params["pred1"]["w"], params["pred1"].get("b"),
                    sizes[0]), params["pred1"], ms)
            else:
                ch = upsample_conv_scale(xdec, params[f"pred{scale}"],
                                         target_hw=sizes[0], static_scale=ms)
            charges[scale] = ch  # [T·B, H, W, 1], T-major

    # depth-integrator pool: within step t heads charge in order 4→1, and
    # the potential carries across steps. Last-step depth_k therefore is
    # v0 + all charges from steps < T-1 + charges of heads ≥ k at step T-1.
    head_order = sorted(cfg.heads, reverse=True)
    v0_depth = state["Ineurons"].astype(frames.dtype)
    prefix = v0_depth
    if T > 1:
        prefix = prefix + sum(
            step_slice(charges[s], t)
            for s in head_order for t in range(T - 1))
    depths_by_scale: Dict[int, Array] = {}
    running = prefix
    for s in head_order:
        running = running + step_slice(charges[s], T - 1)
        depths_by_scale[s] = running
    new_state["Ineurons"] = running

    depths = [depths_by_scale[s] for s in sorted(cfg.heads)]
    return depths, spikes_last, new_state
