"""Full-model equivalence against an independent torch re-implementation.

The strongest composition proof obtainable without the MVSEC data: a
test-local torch U-Net implementing the reference's COMPOSED graph —
skip wiring, the shared depth-integrator pool's 4→1 charge order
(``/root/reference/network/SNN_models.py:170-188``), MultiplyBy placement
(``:76-79``), per-scale upsample targets (``:111-128``), SEW bottleneck
(``blocks.py:135-181``) — fed the SAME weights through
``interop.params_to_torch_state_dict``, then forward depths AND gradients
(input, every conv weight, PLIF taus) compared against
``forward``/``forward_sequence``.

Per-op tests (test_layers/test_neurons) cannot catch a composition bug; a
wrong skip target or head order would pass all of them. This file pins the
whole network. Everything runs in float64 (both frameworks) so comparisons
are exact to ~1e-12 and no threshold-boundary spike can flip between the
two implementations' summation orders.

The torch model below is written from the documented semantics (same
technique as test_neurons.py's cell oracle); it is NOT the reference code
(which depends on SpikingJelly, not installed here).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stereospike_tpu.interop import (
    _CONV_SITES,
    _PLIF_KEYS,
    _get,
    ann_params_to_torch_state_dict,
    params_to_torch_state_dict,
)
from stereospike_tpu.models import (
    forward_sequence,
    init_params,
    stereospike,
    stereospike_tempo,
)
from stereospike_tpu.models.ann import (
    AnnConfig,
    ann_forward,
    init_ann_params,
    init_ann_state,
)

HW = (48, 64)


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _f64(tree):
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64), tree)


# ------------------------------------------------------------- torch oracle
class _ATan(torch.autograd.Function):
    """SpikingJelly ATan surrogate (surrogate.py docstring formulas)."""

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


class _Sigmoid(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, alpha):
        ctx.save_for_backward(x)
        ctx.alpha = alpha
        return (x >= 0).to(x)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        s = torch.sigmoid(ctx.alpha * x)
        return g * ctx.alpha * s * (1 - s), None


def _spike(x, surrogate, alpha):
    fn = _ATan if surrogate == "atan" else _Sigmoid
    return fn.apply(x, alpha)


class TorchStereoSpike:
    """The reference's composed network (SNN_models.py:63-248 / :251-435)
    as a functional torch program over an interop state dict (NCHW)."""

    def __init__(self, sd, cfg):
        self.sd = sd
        self.cfg = cfg
        self.v = {}

    def _fire(self, site, x):
        cfg = self.cfg
        in_sew = site.startswith("sew")
        kind = cfg.effective_sew_neuron if in_sew else cfg.neuron
        sur = cfg.sew_surrogate if in_sew else cfg.surrogate
        alpha = (cfg.sew_surrogate_alpha if in_sew else cfg.surrogate_alpha)
        if alpha is None:
            alpha = 2.0 if sur == "atan" else 4.0
        v = self.v.get(site)
        if v is None:
            v = torch.zeros_like(x)
        if kind == "if":
            h = v + x
        elif kind == "lif":
            h = v + (x - v) / cfg.tau
        elif kind == "plif":
            h = v + (x - v) * torch.sigmoid(self.sd[_PLIF_KEYS[site]])
        else:
            raise ValueError(kind)
        s = _spike(h - cfg.v_threshold, sur, alpha)
        s_d = s.detach() if cfg.detach_reset else s
        self.v[site] = (1 - s_d) * h  # hard reset to v_reset = 0
        return s

    def _conv(self, x, stem, stride=1, padding=0):
        return F.conv2d(x, self.sd[f"{stem}.weight"],
                        self.sd.get(f"{stem}.bias"), stride=stride,
                        padding=padding)

    def _upconv(self, x, stem, target, k):
        up = F.interpolate(x, size=(target[0] + k - 1, target[1] + k - 1),
                           mode="nearest")
        return self._conv(up, stem)

    def step(self, frame):
        """One timestep; carries membrane state across calls (the
        forward_sequence analog)."""
        cfg = self.cfg
        mf = cfg.multiply_factor
        sizes = cfg.sizes
        fire, conv, upconv = self._fire, self._conv, self._upconv

        out_bottom = fire("bottom", conv(frame, "bottom.0", 1, 2) * mf)
        out_conv1 = fire("conv1", conv(out_bottom, "conv1.0", 2, 2) * mf)
        out_conv2 = fire("conv2", conv(out_conv1, "conv2.0", 2, 2) * mf)
        out_conv3 = fire("conv3", conv(out_conv2, "conv3.0", 2, 2) * mf)
        out_conv4 = fire("conv4", conv(out_conv3, "conv4.0", 2, 2) * mf)

        x = out_conv4
        for i, blk in enumerate(("sew1", "sew2")):
            identity = x
            out = fire(f"{blk}_a",
                       conv(x, f"bottleneck.{i}.conv1.0", 1, 1) * mf)
            out = fire(f"{blk}_b",
                       conv(out, f"bottleneck.{i}.conv2.0", 1, 1) * mf)
            x = out + identity  # connect_function='ADD'
        out_rconv = x

        skips = (out_bottom, out_conv1, out_conv2, out_conv3)
        v_depth = self.v.get("I")
        if v_depth is None:
            v_depth = torch.zeros(frame.shape[0], 1, *sizes[0],
                                  dtype=frame.dtype)
        spikes = [out_rconv]
        depths = {}
        for scale in (4, 3, 2, 1):
            x = fire(f"deconv{scale}",
                     upconv(x, f"deconv{scale}.0.up.1", sizes[scale - 1], 5) * mf)
            if cfg.use_skips:
                x = x + skips[scale - 1]
            spikes.append(x)
            if scale in cfg.heads:
                v_depth = v_depth + upconv(
                    x, f"predict_depth{scale}.0.up.1", sizes[0], 3) * mf
                depths[scale] = v_depth
        self.v["I"] = v_depth
        return [depths[s] for s in sorted(cfg.heads)], spikes


def _loss_torch(depths, spikes):
    loss = sum((i + 1) * (d ** 2).sum() for i, d in enumerate(depths))
    return loss + 0.1 * sum((s * s).sum() for s in spikes)


def _loss_jax(depths, spikes):
    loss = sum((i + 1) * jnp.sum(d ** 2) for i, d in enumerate(depths))
    return loss + 0.1 * sum(jnp.sum(s * s) for s in spikes)


def _nchw(x_nhwc):
    return np.ascontiguousarray(np.moveaxis(np.asarray(x_nhwc), -1, 1))


@pytest.mark.parametrize("variant,T", [
    ("flagship", 1), ("tempo", 3),
    # ablations: the oracle honors cfg.use_skips / cfg.heads, so the
    # no-skip wiring and the cut deepest head are pinned too
    ("noskip", 1), ("cutpredict", 1),
])
def test_composed_network_matches_torch(variant, T, x64):
    """Forward depths + input/weight gradients of the composed network ==
    the torch oracle on the same interop-exported weights, float64."""
    if variant == "flagship":
        cfg = stereospike(in_hw=HW)          # IF, ATan enc/dec, Sigmoid SEW
    elif variant == "noskip":
        from stereospike_tpu.models.factory import stereospike_noskip

        cfg = stereospike_noskip(in_hw=HW)
    elif variant == "cutpredict":
        from stereospike_tpu.models.factory import stereospike_cutpredict

        cfg = stereospike_cutpredict(in_hw=HW)
    else:
        cfg = stereospike_tempo(in_hw=HW)    # PLIF tau=3, mf=10
    params = _f64(init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(1)
    frames = rng.poisson(0.4, (2, T, *HW, 4)).astype(np.float64)

    # ---- torch side: interop-exported weights, all requiring grad
    sd_np = params_to_torch_state_dict(params)
    sd = {k: torch.tensor(np.asarray(v, np.float64), requires_grad=True)
          for k, v in sd_np.items()}
    xt = torch.tensor(np.ascontiguousarray(np.moveaxis(frames, -1, 2)),
                      requires_grad=True)  # [B, T, C, H, W] leaf
    oracle = TorchStereoSpike(sd, cfg)
    for t in range(T):
        depths_t, spikes_t = oracle.step(xt[:, t])
    loss_t = _loss_torch(depths_t, spikes_t)
    loss_t.backward()

    # ---- jax side
    def loss_fn(p, x):
        depths, spikes, _ = forward_sequence(p, x, cfg)
        return _loss_jax(depths, spikes), depths

    (loss_j, depths_j), (g_params, g_x) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, jnp.asarray(frames))

    assert len(depths_j) == len(depths_t) == len(cfg.heads)
    # forward equivalence (every cumulative depth scale)
    for d_j, d_t in zip(depths_j, depths_t):
        np.testing.assert_allclose(_nchw(d_j), d_t.detach().numpy(),
                                   rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-10)

    # gradient equivalence: input + every exported weight tensor
    np.testing.assert_allclose(np.moveaxis(np.asarray(g_x), -1, 2),
                               xt.grad.numpy(), rtol=1e-8, atol=1e-10)
    # same key mapping as params_to_torch_state_dict, but float64-preserving
    # (the interop exporter casts to the reference's fp32, which would
    # corrupt this exact-grad comparison)
    g_sd = {}
    for path, stem in _CONV_SITES:
        try:
            leaf = _get(g_params, path)
        except (KeyError, TypeError):
            continue  # cut-predict: the cut head has no pytree leaf
        g_sd[f"{stem}.weight"] = np.asarray(leaf["w"]).transpose(3, 2, 0, 1)
        if "b" in leaf:
            g_sd[f"{stem}.bias"] = np.asarray(leaf["b"])
    for site, w in g_params.get("plif", {}).items():
        g_sd[_PLIF_KEYS[site]] = np.asarray(w).reshape(())
    checked = 0
    for k, g in g_sd.items():
        ref = sd[k].grad
        assert ref is not None, f"torch oracle never used {k}"
        np.testing.assert_allclose(np.asarray(g, np.float64).reshape(ref.shape),
                                   ref.numpy(), rtol=1e-8, atol=1e-10,
                                   err_msg=k)
        checked += 1
    assert checked >= 17  # all conv sites (+ 13 PLIF taus for tempo)
    if variant == "tempo":
        assert any(k.endswith(".w") for k in g_sd)


def test_composed_ann_matches_torch(x64):
    """The equivalent ANN (conv+bias → activation → BatchNorm, frozen
    running stats; reference ANN_models.py:28-152) composed-graph check."""
    cfg = AnnConfig(in_hw=HW, activation="sigmoid")
    params = _f64(init_ann_params(jax.random.PRNGKey(3), cfg))
    # nontrivial BN running stats so the normalization math is exercised
    rng = np.random.default_rng(4)
    # values snapped to fp32 so the interop export (which writes the
    # reference's fp32) is lossless for this float64 comparison
    bn_state = jax.tree.map(
        lambda x: jnp.asarray(
            rng.uniform(0.5, 1.5, np.shape(x)).astype(np.float32),
            jnp.float64),
        init_ann_state(cfg))
    frames = rng.poisson(0.4, (2, *HW, 4)).astype(np.float64)

    sd_np = ann_params_to_torch_state_dict(params, bn_state)
    sd = {k: torch.tensor(np.asarray(v, np.float64))
          for k, v in sd_np.items()}
    xt = torch.tensor(_nchw(frames), requires_grad=True)

    def conv(x, stem, stride=1, padding=0):
        return F.conv2d(x, sd[f"{stem}.weight"], sd.get(f"{stem}.bias"),
                        stride=stride, padding=padding)

    def bn(x, stem):
        return (x - sd[f"{stem}.running_mean"][:, None, None]) \
            / torch.sqrt(sd[f"{stem}.running_var"][:, None, None] + 1e-5) \
            * sd[f"{stem}.weight"][:, None, None] \
            + sd[f"{stem}.bias"][:, None, None]

    def upconv(x, stem, target, k):
        up = F.interpolate(x, size=(target[0] + k - 1, target[1] + k - 1),
                           mode="nearest")
        return conv(up, stem)

    act = torch.sigmoid
    sizes = cfg.skeleton.sizes
    out_bottom = bn(act(conv(xt, "bottom.0", 1, 2)), "bottom.2")
    outs = [out_bottom]
    for i in range(1, 5):
        outs.append(bn(act(conv(outs[-1], f"conv{i}.0", 2, 2)), f"conv{i}.2"))
    x = outs[4]
    for i in range(2):
        identity = x
        h = bn(act(conv(x, f"bottleneck.{i}.conv1.0", 1, 1)),
               f"bottleneck.{i}.conv1.2")
        h = bn(act(conv(h, f"bottleneck.{i}.conv2.0", 1, 1)),
               f"bottleneck.{i}.conv2.2")
        x = h + identity
    v_depth = torch.zeros(2, 1, *sizes[0], dtype=xt.dtype)
    depths_t = {}
    for scale in (4, 3, 2, 1):
        x = bn(act(upconv(x, f"deconv{scale}.0.up.1", sizes[scale - 1], 5)),
               f"deconv{scale}.2")
        x = x + outs[scale - 1]
        v_depth = v_depth + upconv(x, f"predict_depth{scale}.0.up.1",
                                   sizes[0], 3)
        depths_t[scale] = v_depth
    loss_t = sum((d ** 2).sum() for d in depths_t.values())
    loss_t.backward()

    depths_j, _ = ann_forward(params, jnp.asarray(frames), cfg, bn_state,
                              train=False)
    for s, d_j in zip((1, 2, 3, 4), depths_j):
        np.testing.assert_allclose(_nchw(d_j), depths_t[s].detach().numpy(),
                                   rtol=1e-9, atol=1e-9, err_msg=f"depth{s}")

    g_x = jax.grad(lambda x: sum(
        jnp.sum(d ** 2) for d in ann_forward(params, x, cfg, bn_state,
                                             train=False)[0]))(
        jnp.asarray(frames))
    np.testing.assert_allclose(_nchw(g_x), xt.grad.numpy(),
                               rtol=1e-8, atol=1e-10)
