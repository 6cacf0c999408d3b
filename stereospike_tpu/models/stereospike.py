"""StereoSpike: fully-spiking U-Net for dense depth from event streams.

TPU-native re-design of the reference architecture
(``/root/reference/network/SNN_models.py:63-248`` and variants ``:251-898``):

- encoder: bottom conv(k5,s1) then 4× conv(k5,s2), channels 32→64→128→256→512
- bottleneck: 2× SEW residual blocks (ADD connect)
- decoder: 4× NNConvUpsampling(k5) to the mirrored encoder resolutions, with
  additive spike skip connections
- prediction: per-scale NNConvUpsampling(k3, bias) heads charging one shared
  pool of non-firing integrator neurons whose membrane potential *is* the
  depth map — a **cumulative** multi-scale prediction: depth_k = potential
  after head k's charge has been added on top of deeper heads' charges
  (reference ``SNN_models.py:170-188``)

Differences from the reference are design, not behavior:

- functional: parameters are a pytree; neuron membrane potentials are an
  explicit state dict (a ``lax.scan`` carry for T>1), so "reset_net" is just
  ``init_state``
- activations NHWC (channel-minor = TPU lane dimension), weights HWIO
- resolution is a config parameter: the per-level spatial sizes (including
  the baked upsample targets (33,44)/(65,87)/(130,173)/(260,346) of the
  reference at 260×346) are derived from ``in_hw`` by conv arithmetic
- one skeleton serves every reference variant (IF flagship, LIF/PLIF
  "tempo", monocular, no-skip, cut-predict) via config
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from stereospike_tpu.nn.blocks import (
    _apply_scale,
    conv_scale,
    init_conv_block,
    init_sew_block,
    sew_block_apply,
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
from stereospike_tpu.snn.neurons import if_step, integrator_step, lif_step, plif_step, plif_w_from_tau
from stereospike_tpu.snn.surrogate import make_spike_fn

Array = jax.Array

# The 14 firing-rate taps the reference actually measures
# (SNN_models.py:197-245). Its dict declares a 15th key, 'out_combined',
# that is never assigned — a vestigial 0.0 from an earlier concat variant —
# so it is deliberately omitted rather than reported as a fake always-zero
# density.
TAP_NAMES = (
    "out_bottom", "out_conv1", "out_conv2", "out_conv3", "out_conv4",
    "out_rconv",
    "out_deconv4", "out_add4", "out_deconv3", "out_add3",
    "out_deconv2", "out_add2", "out_deconv1", "out_add1",
)

_PLIF_SITES = (
    "bottom", "conv1", "conv2", "conv3", "conv4",
    "deconv4", "deconv3", "deconv2", "deconv1",
)
_SEW_PLIF_SITES = ("sew1_a", "sew1_b", "sew2_a", "sew2_b")

# Prediction-head kernel size (reference NNConvUpsampling k=3,
# blocks.py:110-132). Shared by ``init_params`` and the conv-form head
# support check so the two can never desync.
PRED_HEAD_K = 3


@dataclasses.dataclass(frozen=True)
class StereoSpikeConfig:
    """Architecture + neuron configuration for the StereoSpike family."""

    in_channels: int = 4                 # 4 binocular, 2 monocular
    base_channels: int = 32
    in_hw: Tuple[int, int] = (260, 346)
    neuron: str = "if"                   # 'if' | 'lif' | 'plif' (encoder/decoder)
    tau: float = 3.0                     # LIF tau / PLIF init tau
    surrogate: str = "atan"
    surrogate_alpha: Optional[float] = None
    sew_neuron: Optional[str] = None     # default: 'if' if neuron=='if' else 'plif'
    sew_surrogate: str = "sigmoid"       # reference SEWResBlock default
    sew_surrogate_alpha: Optional[float] = None
    v_threshold: float = 1.0
    v_reset: Optional[float] = 0.0
    detach_reset: bool = True
    multiply_factor: float = 1.0
    learnable_multiply: bool = False
    use_skips: bool = True
    heads: Tuple[int, ...] = (1, 2, 3, 4)  # scales with prediction heads
    connect_fn: str = "ADD"
    # phase-stacked decoder upsample-convs: math-identical MXU-lane packing
    # that is faster forward-only but slower under BPTT (see
    # nn/layers.upsample_conv) — inference drivers flip this on
    phase_upsample: bool = False
    # space-to-depth-canonical level 0: every full-resolution tensor lives
    # as [B, H/2, W/2, 4C] (2×2 pixel block on the lane dimension), so the
    # small-C full-res convs are lane-dense and deconv1's phase-stacked
    # upsample-conv needs NO depth-to-space relayout (the relayout is what
    # made phase-stacking lose under BPTT — nn/layers.space_to_depth).
    # Math-identical up to float reassociation; auto-disabled for odd in_hw.
    s2d_level0: bool = True
    # polyphase deconv1 (nn/poly_route.py): the upsample-conv composite
    # collapsed to one low-res 3×3 pattern conv (2.8× fewer MACs) + copy-
    # speed routing with a hand-transposed VJP. Same math up to float
    # reassociation (float64-pinned); measured at the production deconv1
    # site (B=128 bf16, v5e): 16.5→10.1 ms fwd (1.63×), 42.5→32.1 ms
    # fwd+bwd (1.32×) — benchmarks/pallas_poly_deconv.json. Auto-falls
    # back to the composite when an axis is not ~2× or the level 0 is
    # not s2d-canonical, and below ``poly_min_batch`` rows (see below).
    poly_deconv1: bool = True
    # the polyphase DUS routing is BATCH-SENSITIVE: its copy chain only
    # beats the composite when the deconv1 site's leading dim (B, or T·B
    # for the layer-major multistep) is large enough to amortize the
    # per-copy overhead. Measured whole-step train ratios poly/composite
    # (v5e, bf16): leading 128 → 1.049×, leading 80 → 0.712× (both
    # B·T=80 layer-major 0.705× and B=80 T=1 0.712× — the cliff tracks
    # the site's leading dim, not T), leading 16 under scan+remat →
    # 0.465× (benchmarks/pallas_poly_deconv.json batch_sweep). The
    # routing therefore engages only when the TRACED leading dim at the
    # site is >= this threshold (static at trace time; under GSPMD jit
    # the traced shape is the global batch, under shard_map the
    # per-shard one). Set 0 to force polyphase at any batch.
    poly_min_batch: int = 128
    # polyphase for the INNER decoder sites deconv2/3/4 (odd target axes:
    # phase buffer + depth-to-space crop, nn/poly_route.py,
    # layers.upsample_conv poly=True). Per-site: True = all inner sites,
    # False = none, or a tuple of scales, e.g. ``(3,)`` = deconv3 only.
    # Decided by the interleaved re-measurement
    # (benchmarks/poly_inner_site.json, B=128 bf16, v5e, 3 interleaved
    # repeats to kill the run-to-run variance the earlier single-shot
    # numbers showed): deconv3-only is a whole-step win — 1.0235× median
    # (779 vs 761 f/s; isolated site 1.245× fwd+bwd) — while all-inner is
    # a whole-step LOSS (0.9645×: deconv2's d2s epilogue + fix-ups eat
    # the MAC win, deconv4 is a wash). The shipped default is therefore
    # deconv3 only. Like deconv1, the DUS routing is batch-sensitive, so
    # selected sites also gate on ``poly_min_batch`` (same cliff
    # mechanics: the copy chain amortizes per-copy overhead over the
    # leading dim).
    poly_deconv: Union[bool, Tuple[int, ...]] = (3,)
    # conv-form pred1 head on the s2d level 0: the head's nearest upsample
    # (target+2 / target ≈ 1 for the k3 head) is a concat of slices in s2d
    # layout and the 3×3 C_out=1 VALID conv collapses to ONE lane-dense
    # 2×2 s2d conv [4C → 4] (nn/layers._upsample_conv_1out_s2d_conv) —
    # replacing the selection form's two joint-contraction GEMMs (~190
    # GFLOP of 0/1 arithmetic at the flagship site) with a ~12-GFLOP MXU
    # conv. Same math up to reassociation (float64-pinned); auto-falls
    # back when the shape has no near-identity plan. Measured OFF
    # (benchmarks/pred_head_site.json): despite the ~16× FLOP reduction,
    # the conv form is 0.49× the selection form at the isolated site
    # (11.6 → 23.7 ms fwd+bwd) and 0.93× whole-step (779 → 723 f/s) —
    # the slice-concat assembly + its backward slice-grads lose to two
    # dense MXU GEMMs, another case (like phase_upsample) of FLOP
    # arithmetic inverting under XLA's fusion. Selection stays the
    # default; the conv form remains as the low-FLOP alternative for
    # backends that bill by MACs.
    pred_s2d_conv: bool = False

    @property
    def channels(self) -> Tuple[int, ...]:
        b = self.base_channels
        return (b, 2 * b, 4 * b, 8 * b, 16 * b)

    @property
    def sizes(self) -> Tuple[Tuple[int, int], ...]:
        """Spatial sizes per level: level 0 = input res, level 4 = bottleneck.

        Each k5/s2/p2 conv maps H → ceil(H/2); at 260×346 this reproduces the
        reference pyramid (260,346)/(130,173)/(65,87)/(33,44)/(17,22).
        """
        h, w = self.in_hw
        out = [(h, w)]
        for _ in range(4):
            h, w = math.ceil(h / 2), math.ceil(w / 2)
            out.append((h, w))
        return tuple(out)

    def for_inference(self) -> "StereoSpikeConfig":
        """The no-grad execution profile: enable the phase-stacked decoder
        upsample-convs (math-identical, ~2× faster forward-only; slower
        under BPTT — see ``nn/layers.upsample_conv``). Every inference
        entry point (eval step, firing-rate profiler, streaming evaluator)
        should construct its config through this, keeping the policy in
        one place."""
        return dataclasses.replace(self, phase_upsample=True)

    @property
    def use_s2d_level0(self) -> bool:
        """The s2d execution layout needs even level-0 dims (260×346 ✓)."""
        return bool(self.s2d_level0
                    and self.in_hw[0] % 2 == 0 and self.in_hw[1] % 2 == 0)

    @property
    def use_poly_deconv1(self) -> bool:
        """Shape capability only — the runtime routing also gates on the
        traced leading dim (:meth:`poly_deconv1_at`)."""
        from stereospike_tpu.nn.poly_route import poly_supported

        return bool(self.poly_deconv1 and self.use_s2d_level0
                    and poly_supported(self.sizes[1], self.sizes[0], 5))

    def poly_deconv1_at(self, leading: int) -> bool:
        """Route deconv1 polyphase for a site whose traced leading dim is
        ``leading`` (B, or T·B layer-major) — capability AND the measured
        batch cliff (see ``poly_min_batch``)."""
        return self.use_poly_deconv1 and leading >= self.poly_min_batch

    @property
    def use_pred_s2d_conv(self) -> bool:
        """Conv-form pred1 head: the knob AND a near-identity assembly plan
        at this model's level-0 shape (nn/layers)."""
        from stereospike_tpu.nn.layers import pred_head_s2d_conv_supported

        h, w = self.sizes[0]
        return bool(self.pred_s2d_conv and self.use_s2d_level0
                    and pred_head_s2d_conv_supported(h // 2, w // 2,
                                                     (h, w), PRED_HEAD_K))

    def poly_inner_at(self, scale: int, leading: int) -> bool:
        """Route an INNER decoder site (deconv2/3/4, ``scale`` ∈ {2,3,4})
        polyphase: selected by ``poly_deconv`` (bool = all/none, or a
        tuple of scales) AND past the ``poly_min_batch`` leading-dim cliff
        (the DUS copy chain amortizes over the leading dim exactly as at
        deconv1)."""
        pd = self.poly_deconv
        on = scale in pd if isinstance(pd, (tuple, list, set)) else bool(pd)
        return on and leading >= self.poly_min_batch

    @property
    def effective_sew_neuron(self) -> str:
        if self.sew_neuron is not None:
            return self.sew_neuron
        return "if" if self.neuron == "if" else "plif"

    @property
    def learnable_scale(self) -> Optional[float]:
        return self.multiply_factor if self.learnable_multiply else None


# ------------------------------------------------------------------ params
def init_params(key: Array, cfg: StereoSpikeConfig) -> Dict:
    """Initialize the parameter pytree (torch-default conv init)."""
    keys = jax.random.split(key, 16)
    c = cfg.channels
    ls = cfg.learnable_scale
    params: Dict = {
        "bottom": init_conv_block(keys[0], 5, cfg.in_channels, c[0], learnable_scale=ls),
        "conv1": init_conv_block(keys[1], 5, c[0], c[1], learnable_scale=ls),
        "conv2": init_conv_block(keys[2], 5, c[1], c[2], learnable_scale=ls),
        "conv3": init_conv_block(keys[3], 5, c[2], c[3], learnable_scale=ls),
        "conv4": init_conv_block(keys[4], 5, c[3], c[4], learnable_scale=ls),
        "sew1": init_sew_block(keys[5], c[4], learnable_scale=ls),
        "sew2": init_sew_block(keys[6], c[4], learnable_scale=ls),
        "deconv4": init_conv_block(keys[7], 5, c[4], c[3], learnable_scale=ls),
        "deconv3": init_conv_block(keys[8], 5, c[3], c[2], learnable_scale=ls),
        "deconv2": init_conv_block(keys[9], 5, c[2], c[1], learnable_scale=ls),
        "deconv1": init_conv_block(keys[10], 5, c[1], c[0], learnable_scale=ls),
    }
    for i, s in enumerate((1, 2, 3, 4)):
        if s in cfg.heads:
            params[f"pred{s}"] = init_conv_block(
                keys[11 + i], PRED_HEAD_K, c[s - 1], 1, bias=True,
                learnable_scale=ls
            )
    if cfg.neuron == "plif":
        params["plif"] = {site: plif_w_from_tau(cfg.tau) for site in _PLIF_SITES}
    if cfg.effective_sew_neuron == "plif":
        params.setdefault("plif", {})
        params["plif"].update(
            {site: plif_w_from_tau(cfg.tau) for site in _SEW_PLIF_SITES}
        )
    return params


def init_state(cfg: StereoSpikeConfig, batch: int, dtype=jnp.float32) -> Dict:
    """Fresh zero membrane-potential state (the functional ``reset_net``).

    Includes every spiking site plus the shared output integrator pool
    ('Ineurons'). For the stateless flagship this is rebuilt every chunk.
    """
    c = cfg.channels
    s = cfg.sizes

    def z(level: int, ch: int) -> Array:
        if level == 0 and cfg.use_s2d_level0:
            # level-0 membrane potentials live in the s2d execution layout
            return jnp.zeros((batch, s[0][0] // 2, s[0][1] // 2, 4 * ch),
                             dtype)
        return jnp.zeros((batch, s[level][0], s[level][1], ch), dtype)

    state = {
        "bottom": z(0, c[0]),
        "conv1": z(1, c[1]),
        "conv2": z(2, c[2]),
        "conv3": z(3, c[3]),
        "conv4": z(4, c[4]),
        "sew1_a": z(4, c[4]),
        "sew1_b": z(4, c[4]),
        "sew2_a": z(4, c[4]),
        "sew2_b": z(4, c[4]),
        "deconv4": z(3, c[3]),
        "deconv3": z(2, c[2]),
        "deconv2": z(1, c[1]),
        "deconv1": z(0, c[0]),
        # the depth-integrator pool is ALWAYS canonical [B, H, W, 1]: the
        # heads emit canonical charges and the loss consumes depths directly
        "Ineurons": jnp.zeros((batch, s[0][0], s[0][1], 1), dtype),
    }
    return state


# ------------------------------------------------------------------ forward
def _make_fire(params: Dict, cfg: StereoSpikeConfig, state: Dict, new_state: Dict):
    """Build a per-site charge→spike closure handling neuron type and state."""
    spike_enc = make_spike_fn(cfg.surrogate, cfg.surrogate_alpha)
    spike_sew = make_spike_fn(cfg.sew_surrogate, cfg.sew_surrogate_alpha)

    def fire(site: str, x: Array) -> Array:
        in_sew = site.startswith("sew")
        kind = cfg.effective_sew_neuron if in_sew else cfg.neuron
        spike_fn = spike_sew if in_sew else spike_enc
        kw = dict(
            v_threshold=cfg.v_threshold,
            v_reset=cfg.v_reset,
            spike_fn=spike_fn,
            detach_reset=cfg.detach_reset,
        )
        v = state[site]
        if kind == "if":
            v2, s = if_step(v, x, **kw)
        elif kind == "lif":
            v2, s = lif_step(v, x, tau=cfg.tau, **kw)
        elif kind == "plif":
            v2, s = plif_step(v, x, params["plif"][site], **kw)
        else:
            raise ValueError(f"unknown neuron '{kind}'")
        new_state[site] = v2
        return s

    return fire


def forward(
    params: Dict,
    frame: Array,
    cfg: StereoSpikeConfig,
    state: Optional[Dict] = None,
    *,
    return_taps: bool = False,
):
    """One timestep. ``frame``: [B, H, W, C_in].

    Returns ``(depths, spikes, new_state)`` (+ ``taps`` if requested), where
    ``depths`` is ordered full-scale-first ([depth1..depth4] for the default
    head set, matching reference ``SNN_models.py:192``), ``spikes`` is
    ``[out_rconv, out_add4, out_add3, out_add2, out_add1]`` for spike
    penalization, and ``new_state`` carries membrane potentials (incl. the
    depth integrator pool).
    """
    if state is None:
        state = init_state(cfg, frame.shape[0], frame.dtype)
    new_state: Dict = {}
    fire = _make_fire(params, cfg, state, new_state)
    ms = cfg.multiply_factor if not cfg.learnable_multiply else 1.0
    sizes = cfg.sizes
    use_s2d = cfg.use_s2d_level0
    taps: Dict[str, Array] = {}

    def tap(name: str, x: Array) -> Array:
        if return_taps:
            taps[name] = x
        return x

    # encoder. On the s2d execution path every level-0 tensor lives as
    # [B, H/2, W/2, 4C] (nn/layers.space_to_depth): bottom/conv1 run with
    # expanded kernels on that grid, and no full-res layout op exists
    # anywhere in the program. Math identical up to float reassociation.
    if use_s2d:
        x0 = space_to_depth(frame)
        out_bottom = tap("out_bottom", fire("bottom", _apply_scale(
            conv2d_s2d(x0, params["bottom"]["w"], params["bottom"].get("b"),
                       stride=1), params["bottom"], ms)))
        out_conv1 = tap("out_conv1", fire("conv1", _apply_scale(
            conv2d_s2d(out_bottom, params["conv1"]["w"],
                       params["conv1"].get("b"), stride=2),
            params["conv1"], ms)))
    else:
        out_bottom = tap("out_bottom", fire("bottom", conv_scale(
            frame, params["bottom"], stride=1, padding=2, static_scale=ms)))
        out_conv1 = tap("out_conv1", fire("conv1", conv_scale(
            out_bottom, params["conv1"], stride=2, padding=2, static_scale=ms)))
    out_conv2 = tap("out_conv2", fire("conv2", conv_scale(
        out_conv1, params["conv2"], stride=2, padding=2, static_scale=ms)))
    out_conv3 = tap("out_conv3", fire("conv3", conv_scale(
        out_conv2, params["conv3"], stride=2, padding=2, static_scale=ms)))
    out_conv4 = tap("out_conv4", fire("conv4", conv_scale(
        out_conv3, params["conv4"], stride=2, padding=2, static_scale=ms)))

    # bottleneck: 2 SEW residual blocks
    out = sew_block_apply(
        params["sew1"], out_conv4,
        lambda x: fire("sew1_a", x), lambda x: fire("sew1_b", x),
        static_scale=ms, connect_fn=cfg.connect_fn)
    out_rconv = tap("out_rconv", sew_block_apply(
        params["sew2"], out,
        lambda x: fire("sew2_a", x), lambda x: fire("sew2_b", x),
        static_scale=ms, connect_fn=cfg.connect_fn))

    # decoder with cumulative depth integration
    v_depth = state["Ineurons"]
    skips = (out_bottom, out_conv1, out_conv2, out_conv3)
    depths_by_scale: Dict[int, Array] = {}
    spikes: List[Array] = [out_rconv]

    x = out_rconv
    for scale in (4, 3, 2, 1):
        if scale == 1 and use_s2d:
            # upsample-conv landing directly in the s2d layout: polyphase
            # (2.8× fewer MACs, nn/poly_route.py) or the phase-stacked
            # composite; both relayout-free
            if cfg.poly_deconv1_at(x.shape[0]):
                from stereospike_tpu.nn.poly_route import upsample_conv_s2d_poly

                up1 = upsample_conv_s2d_poly(x, params["deconv1"]["w"],
                                             target_hw=sizes[0])
            else:
                up1 = upsample_conv_s2d_out(x, params["deconv1"]["w"],
                                            target_hw=sizes[0])
            x = tap("out_deconv1", fire("deconv1", _apply_scale(
                up1, params["deconv1"], ms)))
        else:
            x = tap(f"out_deconv{scale}", fire(f"deconv{scale}",
                    upsample_conv_scale(
                        x, params[f"deconv{scale}"], target_hw=sizes[scale - 1],
                        static_scale=ms, phase=cfg.phase_upsample,
                        poly=cfg.poly_inner_at(scale, x.shape[0]))))
        if cfg.use_skips:
            x = x + skips[scale - 1]
        x = tap(f"out_add{scale}", x)
        # public spike-tensor contract stays canonical full-res; the d2s is
        # dead code unless spike penalization consumes it
        spikes.append(depth_to_space(x) if scale == 1 and use_s2d else x)
        if scale in cfg.heads:
            if scale == 1 and use_s2d:
                head = (_upsample_conv_1out_s2d_conv if cfg.use_pred_s2d_conv
                        else _upsample_conv_1out_s2d)
                charge = _apply_scale(head(
                    x, params["pred1"]["w"], params["pred1"].get("b"),
                    sizes[0]), params["pred1"], ms)
            else:
                charge = upsample_conv_scale(
                    x, params[f"pred{scale}"], target_hw=sizes[0],
                    static_scale=ms)
            v_depth = integrator_step(v_depth, charge)
            depths_by_scale[scale] = v_depth

    new_state["Ineurons"] = v_depth
    depths = [depths_by_scale[s] for s in sorted(cfg.heads)]

    if return_taps:
        return depths, spikes, new_state, taps
    return depths, spikes, new_state


def forward_sequence(
    params: Dict,
    frames: Array,
    cfg: StereoSpikeConfig,
    state: Optional[Dict] = None,
    *,
    remat: bool = False,
):
    """Scan ``forward`` over time. ``frames``: [B, T, H, W, C].

    Membrane potentials (including the depth integrator) carry across steps;
    returns the outputs of the **last** step plus the final state — the
    natural generalization of the reference's stateful multi-chunk mode
    (``SNN_models.py:22-48``). ``remat=True`` rematerializes each timestep in
    the backward pass (memory ∝ O(1) instead of O(T) activations).
    """
    B, T = frames.shape[:2]
    if state is None:
        state = init_state(cfg, B, frames.dtype)

    # Only the LAST step's outputs are consumed, so the scan covers steps
    # 0..T-2 carrying just the membrane state (no per-step output stacking —
    # stacking T copies of the full-resolution depth/spike tensors was the
    # dominant memory term and OOM'd long-T training); the final step runs
    # outside the scan and produces the returned depths/spikes.
    if T > 1:
        def step(st, frame):
            _, _, new_state = forward(params, frame, cfg, st)
            return new_state, None

        if remat:
            step = jax.checkpoint(step)
        frames_t = jnp.moveaxis(frames[:, :-1], 1, 0)  # [T-1, B, H, W, C]
        state, _ = jax.lax.scan(step, state, frames_t)
    return forward(params, frames[:, -1], cfg, state)


def firing_rates(params: Dict, frame: Array, cfg: StereoSpikeConfig,
                 state: Optional[Dict] = None) -> Dict[str, Array]:
    """Per-tap spike density count_nonzero/size (reference
    ``calculate_firing_rates``, SNN_models.py:194-245) as on-device scalars."""
    _, _, _, taps = forward(params, frame, cfg, state, return_taps=True)
    return {
        name: jnp.count_nonzero(t).astype(jnp.float32) / t.size
        for name, t in taps.items()
    }


def firing_rates_sequence(params: Dict, frames: Array, cfg: StereoSpikeConfig,
                          state: Optional[Dict] = None) -> Dict[str, Array]:
    """Per-tap densities over a FULL [B, T, H, W, C] sequence: the stateful
    generalization of :func:`firing_rates` — membrane potentials carry across
    the T steps exactly as in :func:`forward_sequence`, and each tap's
    density is the mean over all T steps. At T=1 this equals
    :func:`firing_rates` on ``frames[:, 0]`` (the reference's stateless
    recipe, calculate_firing_rates.py:125-135); at T>1 it profiles the same
    temporal execution the framework trains with, instead of silently
    measuring only step 0."""
    B, T = frames.shape[:2]
    if not jnp.issubdtype(frames.dtype, jnp.floating):
        frames = frames.astype(jnp.float32)  # uint8-packed count frames
    if state is None:
        state = init_state(cfg, B, frames.dtype)

    def step(st, frame):
        _, _, new_state, taps = forward(params, frame, cfg, st,
                                        return_taps=True)
        dens = {
            name: jnp.count_nonzero(t).astype(jnp.float32) / t.size
            for name, t in taps.items()
        }
        return new_state, dens

    _, dens = jax.lax.scan(step, state, jnp.moveaxis(frames, 1, 0))
    return {k: jnp.mean(v) for k, v in dens.items()}


def count_params(params: Dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
