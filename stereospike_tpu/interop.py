"""Checkpoint interop with the reference PyTorch implementation.

A user of the reference has trained ``.pth`` checkpoints
(``torch.save(net.state_dict(), ...)``, reference ``train.py:351``). This
module maps that state dict onto this framework's parameter pytree — and
back — so existing checkpoints keep working after the switch.

Key layout of the reference's flagship/variant models (torch derives the
names from the module tree, ``network/SNN_models.py:63-248`` / ``:251-435``;
blocks ``network/blocks.py:90-181``):

    bottom.0.weight                   Conv2d [O, I, k, k], bias=False
    conv{1..4}.0.weight
    bottleneck.{0,1}.conv{1,2}.0.weight        (SEWResBlock inner convs)
    bottleneck.{0,1}.sn{1,2}.w                 (PLIF raw leak, if use_plif)
    deconv{4..1}.0.up.1.weight                 (NNConvUpsampling's conv)
    predict_depth{4..1}.0.up.1.weight/.bias
    {site}.2.w                                 (PLIF nodes of the tempo
                                                variant; IF/LIF have no
                                                parameters)
    {site}.1.scale_value                       (learnable MultiplyBy)

Our pytree (``models/stereospike.py::init_params``) holds the same tensors
as ``{'bottom': {'w': HWIO}, ..., 'sew1': {'conv1': {'w': ...}}, ...,
'pred{s}': {'w', 'b'}, 'plif': {site: w}}``. Weight layout conversion is
OIHW ↔ HWIO transposition; the PLIF raw parameter transfers verbatim
(both sides use ``sigmoid(w) = 1/tau``, SpikingJelly's convention).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from stereospike_tpu.models.stereospike import StereoSpikeConfig

# (our pytree path) <-> (reference state-dict key); conv weights only — bias
# and PLIF/scale keys are derived from these stems
_CONV_SITES = [
    (("bottom",), "bottom.0"),
    (("conv1",), "conv1.0"),
    (("conv2",), "conv2.0"),
    (("conv3",), "conv3.0"),
    (("conv4",), "conv4.0"),
    (("sew1", "conv1"), "bottleneck.0.conv1.0"),
    (("sew1", "conv2"), "bottleneck.0.conv2.0"),
    (("sew2", "conv1"), "bottleneck.1.conv1.0"),
    (("sew2", "conv2"), "bottleneck.1.conv2.0"),
    (("deconv4",), "deconv4.0.up.1"),
    (("deconv3",), "deconv3.0.up.1"),
    (("deconv2",), "deconv2.0.up.1"),
    (("deconv1",), "deconv1.0.up.1"),
    (("pred4",), "predict_depth4.0.up.1"),
    (("pred3",), "predict_depth3.0.up.1"),
    (("pred2",), "predict_depth2.0.up.1"),
    (("pred1",), "predict_depth1.0.up.1"),
]

# PLIF node key per site: encoder/decoder nodes sit at Sequential index 2;
# the SEW blocks name theirs sn1/sn2 (blocks.py:151,158)
_PLIF_KEYS = {
    "bottom": "bottom.2.w",
    "conv1": "conv1.2.w", "conv2": "conv2.2.w",
    "conv3": "conv3.2.w", "conv4": "conv4.2.w",
    "deconv4": "deconv4.2.w", "deconv3": "deconv3.2.w",
    "deconv2": "deconv2.2.w", "deconv1": "deconv1.2.w",
    "sew1_a": "bottleneck.0.sn1.w", "sew1_b": "bottleneck.0.sn2.w",
    "sew2_a": "bottleneck.1.sn1.w", "sew2_b": "bottleneck.1.sn2.w",
}

# learnable MultiplyBy scalar per site (MultiplyBy sits at Sequential
# index 1 everywhere, incl. inside SEW conv Sequentials and pred heads)
_SCALE_KEYS = {
    ("bottom",): "bottom.1.scale_value",
    ("conv1",): "conv1.1.scale_value",
    ("conv2",): "conv2.1.scale_value",
    ("conv3",): "conv3.1.scale_value",
    ("conv4",): "conv4.1.scale_value",
    ("sew1", "conv1"): "bottleneck.0.conv1.1.scale_value",
    ("sew1", "conv2"): "bottleneck.0.conv2.1.scale_value",
    ("sew2", "conv1"): "bottleneck.1.conv1.1.scale_value",
    ("sew2", "conv2"): "bottleneck.1.conv2.1.scale_value",
    ("deconv4",): "deconv4.1.scale_value",
    ("deconv3",): "deconv3.1.scale_value",
    ("deconv2",): "deconv2.1.scale_value",
    ("deconv1",): "deconv1.1.scale_value",
    ("pred4",): "predict_depth4.1.scale_value",
    ("pred3",): "predict_depth3.1.scale_value",
    ("pred2",): "predict_depth2.1.scale_value",
    ("pred1",): "predict_depth1.1.scale_value",
}


def _get(tree: Dict, path):
    for p in path:
        tree = tree[p]
    return tree


def _has(tree: Dict, path) -> bool:
    for p in path:
        if not isinstance(tree, dict) or p not in tree:
            return False
        tree = tree[p]
    return True


def _set(tree: Dict, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _np(x) -> np.ndarray:
    # torch tensors expose .detach().cpu().numpy(); arrays pass through
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def params_from_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    cfg: StereoSpikeConfig,
    *,
    strict: bool = True,
) -> Dict:
    """Convert a reference ``state_dict`` (torch tensors or arrays) into
    this framework's parameter pytree for ``cfg``.

    ``strict=True`` raises on reference keys that map to nothing here
    (catching e.g. an ANN checkpoint fed to the SNN loader).
    """
    params: Dict = {}
    used = set()
    for path, stem in _CONV_SITES:
        wk = f"{stem}.weight"
        if path[0].startswith("pred") and int(path[0][-1]) not in cfg.heads:
            # cut-predict: the reference class still DEFINES predict_depth4
            # in its module tree (SNN_models.py:835 — only the forward call
            # is commented out), so a real reference .pth carries its
            # tensors. Mark them consumed but don't load them: folding dead
            # params into the pytree would give them optimizer state on an
            # import_pth warm start.
            used.update(k for k in (wk, f"{stem}.bias", _SCALE_KEYS[path])
                        if k in state_dict)
            continue
        if wk not in state_dict:
            raise KeyError(f"reference checkpoint is missing '{wk}'")
        w = _np(state_dict[wk])
        if w.ndim != 4:
            raise ValueError(f"'{wk}' is not a conv weight: shape {w.shape}")
        _set(params, path + ("w",), jnp.asarray(
            w.transpose(2, 3, 1, 0), jnp.float32))  # OIHW -> HWIO
        used.add(wk)
        bk = f"{stem}.bias"
        if bk in state_dict:
            _set(params, path + ("b",), jnp.asarray(_np(state_dict[bk]),
                                                    jnp.float32))
            used.add(bk)
    for site, key in _PLIF_KEYS.items():
        if key in state_dict:
            params.setdefault("plif", {})[site] = jnp.asarray(
                _np(state_dict[key]).reshape(()), jnp.float32)
            used.add(key)
    for path, key in _SCALE_KEYS.items():
        if path[0].startswith("pred") and int(path[0][-1]) not in cfg.heads:
            # cut-predict heads were skipped above; folding their learnable
            # scale in anyway would re-create the dead 'pred4' subtree the
            # skip exists to prevent (and break a later export's zero-fill
            # detection, which checks for the subtree's presence)
            continue
        if key in state_dict:
            _set(params, path + ("scale",), jnp.asarray(
                _np(state_dict[key]).reshape(1), jnp.float32))
            used.add(key)

    # shape sanity against the config's own init arithmetic (checked before
    # the strict-mode coherence checks: a channel-count mismatch is the more
    # fundamental error)
    c = cfg.channels
    expect_bottom = (5, 5, cfg.in_channels, c[0])
    got = tuple(params["bottom"]["w"].shape)
    if got != expect_bottom:
        raise ValueError(
            f"bottom conv is {got}, config expects {expect_bottom} "
            f"(in_channels mismatch — monocular vs binocular?)")
    if strict:
        unused = sorted(set(state_dict) - used)
        if unused:
            raise KeyError(
                f"reference checkpoint has {len(unused)} unmapped keys "
                f"(first: {unused[:4]}) — wrong model family?")
        # the config's neuron choice must agree with the checkpoint's PLIF
        # parameters: a use_plif=False reference checkpoint has no encoder/
        # decoder .w keys (LIFNode is parameterless; only the SEW blocks'
        # sn*.w always exist since SEWResBlock hardcodes PLIF in the tempo
        # variant), and the mismatch would otherwise only crash deep inside
        # the jitted forward — or silently discard learned taus
        loaded_plif = set(params.get("plif", {}))
        required = set()
        if cfg.neuron == "plif":
            required |= {s for s in _PLIF_KEYS if not s.startswith("sew")}
        if cfg.effective_sew_neuron == "plif":
            required |= {s for s in _PLIF_KEYS if s.startswith("sew")}
        missing = sorted(required - loaded_plif)
        if missing:
            raise ValueError(
                f"config expects PLIF parameters at {missing[:4]}... but the "
                "checkpoint has none there — it was trained with "
                "use_plif=False (load with a matching lif/if config)")
        extra = sorted(loaded_plif - required)
        if extra:
            raise ValueError(
                f"checkpoint carries learned PLIF taus at {extra[:4]}... that "
                f"this config (neuron={cfg.neuron!r}) would silently ignore — "
                "load with a use_plif=True config")
    return params


def params_to_torch_state_dict(params: Dict,
                               fill_missing_heads: bool = True) -> Dict[str, np.ndarray]:
    """Export this framework's parameter pytree in the reference's
    ``state_dict`` key layout (numpy arrays, OIHW weights) — loadable into
    the reference models via ``load_state_dict`` after ``torch.as_tensor``.

    ``fill_missing_heads``: the reference cut-predict class still defines
    ``predict_depth4`` in its module tree (SNN_models.py:835), so its
    ``state_dict`` contains those keys and a strict ``load_state_dict``
    demands them. A cut-predict pytree has no pred4 leaf; synthesize zero
    tensors for any absent head so the export loads strictly (the module is
    never called in the reference's forward)."""
    out: Dict[str, np.ndarray] = {}
    any_scale = any("scale" in _get(params, p) for p, _ in _CONV_SITES
                    if _has(params, p))
    for path, stem in _CONV_SITES:
        if not _has(params, path):
            if fill_missing_heads and path[0].startswith("pred"):
                c_in = int(np.asarray(
                    _get(params, (f"deconv{path[0][-1]}", "w")).shape[-1]))
                out[f"{stem}.weight"] = np.zeros((1, c_in, 3, 3), np.float32)
                out[f"{stem}.bias"] = np.zeros((1,), np.float32)
                if any_scale:
                    out[_SCALE_KEYS[path]] = np.ones((1,), np.float32)
            continue
        leaf = _get(params, path)
        out[f"{stem}.weight"] = np.asarray(
            leaf["w"], np.float32).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        if "b" in leaf:
            out[f"{stem}.bias"] = np.asarray(leaf["b"], np.float32)
        if "scale" in leaf:
            out[_SCALE_KEYS[path]] = np.asarray(leaf["scale"], np.float32)
    for site, w in params.get("plif", {}).items():
        # SpikingJelly's ParametricLIFNode.w is a 0-dim Parameter: a [1]
        # export would fail the reference's load_state_dict size check
        out[_PLIF_KEYS[site]] = np.asarray(w, np.float32).reshape(())
    return out


def load_torch_checkpoint(path: str, cfg: StereoSpikeConfig,
                          *, strict: bool = True) -> Dict:
    """Load a reference ``.pth`` checkpoint file into a parameter pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_torch_state_dict(sd, cfg, strict=strict)


# ------------------------------------------------------------ ANN baseline
# The equivalent-ANN's module tree (``network/ANN_models.py:28-152``):
# conv Sequentials are (Conv2d, activation, BatchNorm2d) so the BN sits at
# index 2; the ResBlock's inner Sequentials likewise; the prediction heads
# have no MultiplyBy (plain NNConvUpsampling at index 0). Note the
# reference's committed ``test.py:80-84`` actually evaluates THIS model's
# checkpoint, so ANN interop matters in practice.
_ANN_CONV_SITES = [
    (("bottom",), "bottom.0"),
    (("conv1",), "conv1.0"),
    (("conv2",), "conv2.0"),
    (("conv3",), "conv3.0"),
    (("conv4",), "conv4.0"),
    (("res1", "conv1"), "bottleneck.0.conv1.0"),
    (("res1", "conv2"), "bottleneck.0.conv2.0"),
    (("res2", "conv1"), "bottleneck.1.conv1.0"),
    (("res2", "conv2"), "bottleneck.1.conv2.0"),
    (("deconv4",), "deconv4.0.up.1"),
    (("deconv3",), "deconv3.0.up.1"),
    (("deconv2",), "deconv2.0.up.1"),
    (("deconv1",), "deconv1.0.up.1"),
    (("pred4",), "predict_depth4.0.up.1"),
    (("pred3",), "predict_depth3.0.up.1"),
    (("pred2",), "predict_depth2.0.up.1"),
    (("pred1",), "predict_depth1.0.up.1"),
]

# (params path = where gamma/beta live, state path = running stats, stem)
_ANN_BN_SITES = [
    (("bn_bottom",), ("bn_bottom",), "bottom.2"),
    (("bn_conv1",), ("bn_conv1",), "conv1.2"),
    (("bn_conv2",), ("bn_conv2",), "conv2.2"),
    (("bn_conv3",), ("bn_conv3",), "conv3.2"),
    (("bn_conv4",), ("bn_conv4",), "conv4.2"),
    (("res1", "bn1"), ("res1", "bn1"), "bottleneck.0.conv1.2"),
    (("res1", "bn2"), ("res1", "bn2"), "bottleneck.0.conv2.2"),
    (("res2", "bn1"), ("res2", "bn1"), "bottleneck.1.conv1.2"),
    (("res2", "bn2"), ("res2", "bn2"), "bottleneck.1.conv2.2"),
    (("bn_deconv4",), ("bn_deconv4",), "deconv4.2"),
    (("bn_deconv3",), ("bn_deconv3",), "deconv3.2"),
    (("bn_deconv2",), ("bn_deconv2",), "deconv2.2"),
    (("bn_deconv1",), ("bn_deconv1",), "deconv1.2"),
]


def ann_params_from_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    *,
    strict: bool = True,
) -> tuple:
    """Reference ``StereoSpike_equivalentANN`` state dict →
    ``(params, bn_state)`` pytrees (``models/ann.py`` layout)."""
    params: Dict = {}
    bn_state: Dict = {}
    used = set()
    for path, stem in _ANN_CONV_SITES:
        wk = f"{stem}.weight"
        if wk not in state_dict:
            raise KeyError(f"ANN checkpoint is missing '{wk}'")
        w = _np(state_dict[wk])
        _set(params, path + ("w",), jnp.asarray(w.transpose(2, 3, 1, 0),
                                                jnp.float32))
        used.add(wk)
        bk = f"{stem}.bias"
        if bk in state_dict:
            _set(params, path + ("b",), jnp.asarray(_np(state_dict[bk]),
                                                    jnp.float32))
            used.add(bk)
    for ppath, spath, stem in _ANN_BN_SITES:
        _set(params, ppath + ("gamma",), jnp.asarray(
            _np(state_dict[f"{stem}.weight"]), jnp.float32))
        _set(params, ppath + ("beta",), jnp.asarray(
            _np(state_dict[f"{stem}.bias"]), jnp.float32))
        _set(bn_state, spath + ("mean",), jnp.asarray(
            _np(state_dict[f"{stem}.running_mean"]), jnp.float32))
        _set(bn_state, spath + ("var",), jnp.asarray(
            _np(state_dict[f"{stem}.running_var"]), jnp.float32))
        used.update(f"{stem}.{s}" for s in
                    ("weight", "bias", "running_mean", "running_var"))
        used.add(f"{stem}.num_batches_tracked")  # torch bookkeeping; unused
    if strict:
        unused = sorted(set(state_dict) - used)
        if unused:
            raise KeyError(
                f"ANN checkpoint has {len(unused)} unmapped keys "
                f"(first: {unused[:4]}) — is this an SNN checkpoint?")
    return params, bn_state


def ann_params_to_torch_state_dict(params: Dict,
                                   bn_state: Dict) -> Dict[str, np.ndarray]:
    """``(params, bn_state)`` → reference ANN ``state_dict`` layout."""
    out: Dict[str, np.ndarray] = {}
    for path, stem in _ANN_CONV_SITES:
        leaf = _get(params, path)
        out[f"{stem}.weight"] = np.asarray(
            leaf["w"], np.float32).transpose(3, 2, 0, 1)
        if "b" in leaf:
            out[f"{stem}.bias"] = np.asarray(leaf["b"], np.float32)
    for ppath, spath, stem in _ANN_BN_SITES:
        bn = _get(params, ppath)
        st = _get(bn_state, spath)
        out[f"{stem}.weight"] = np.asarray(bn["gamma"], np.float32)
        out[f"{stem}.bias"] = np.asarray(bn["beta"], np.float32)
        out[f"{stem}.running_mean"] = np.asarray(st["mean"], np.float32)
        out[f"{stem}.running_var"] = np.asarray(st["var"], np.float32)
        out[f"{stem}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out


def load_torch_ann_checkpoint(path: str, *, strict: bool = True) -> tuple:
    """Load a reference ANN ``.pth`` file → ``(params, bn_state)``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return ann_params_from_torch_state_dict(sd, strict=strict)
