"""Conv-form pred1 head (nn/layers._upsample_conv_1out_s2d_conv) — exactness
vs the selection form at float64.

The head computes the reference's NNConvUpsampling(k3, C_out=1) prediction
(``network/blocks.py:110-132``) on the s2d-canonical level 0. Its nearest
upsample has ratio (target+k−1)/target ≈ 1, so it is a concat of slices in
s2d layout (``_near_identity_segments``) and the k×k VALID conv collapses to
one (k//2+1)² s2d conv [4C → 4] (``_expand_head_kernel``). These tests pin
the plan builder, the assembled op (forward + gradients, k=3 and k=5), and
the model-level knob.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.nn.layers import (
    _near_identity_segments,
    _upsample_conv_1out_s2d,
    _upsample_conv_1out_s2d_conv,
    pred_head_s2d_conv_supported,
)


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_near_identity_plan_reconstructs_nearest_map():
    """The segment plan IS the nearest map: replaying it row-by-row must
    reproduce torch's floor(dst·in/out) source indices — checked for every
    production axis (260→264, 346→350) and the small test models."""
    # (260, 262)/(346, 348) are the production k=3 head's axes;
    # (260, 264)/(346, 350) the k=5 geometry
    for in_log, up_log in ((260, 262), (346, 348), (260, 264), (346, 350),
                          (48, 52), (64, 68), (32, 36), (44, 48)):
        segs = _near_identity_segments(in_log, up_log)
        assert segs is not None, (in_log, up_log)
        rows = []
        for cls, j, length in segs:
            for d in range(length):
                if cls == "al":
                    rows += [2 * (j + d), 2 * (j + d) + 1]
                elif cls == "an":
                    rows += [2 * (j + d) + 1, 2 * (j + d) + 2]
                else:
                    rows += [2 * j + int(cls[1])] * 2
        src = (np.arange(up_log) * in_log) // up_log
        np.testing.assert_array_equal(np.asarray(rows), src)


def test_plan_rejects_unrepresentable_maps():
    # source steps >= 2 (downsampling) have no {copy, phase-cross, dup}
    # half-row decomposition; odd up sizes have no s2d half-row grid
    assert _near_identity_segments(20, 10) is None
    assert _near_identity_segments(10, 15) is None


@pytest.mark.parametrize("k", [3, 5])  # production heads are k=3
@pytest.mark.parametrize("h2,w2,target", [
    (130, 173, (260, 346)),   # the flagship pred1 site
    (24, 32, (48, 64)),
    (16, 22, (32, 44)),
])
def test_conv_head_matches_selection_head_f64(h2, w2, target, k, x64):
    assert pred_head_s2d_conv_supported(h2, w2, target, k)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h2, w2, 12)))
    w = jnp.asarray(rng.normal(size=(k, k, 3, 1)))
    b = jnp.asarray(rng.normal(size=(1,)))
    ref = _upsample_conv_1out_s2d(x, w, b, target)
    got = _upsample_conv_1out_s2d_conv(x, w, b, target)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


def test_conv_head_gradients_match_f64(x64):
    h2, w2, target = 24, 32, (48, 64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, h2, w2, 12)))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1)))
    b = jnp.asarray(rng.normal(size=(1,)))

    def loss(fn, x, w, b):
        return jnp.sum(fn(x, w, b, target) ** 2)

    g_ref = jax.grad(lambda *a: loss(_upsample_conv_1out_s2d, *a),
                     argnums=(0, 1, 2))(x, w, b)
    g_new = jax.grad(lambda *a: loss(_upsample_conv_1out_s2d_conv, *a),
                     argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(g_new, g_ref, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-10, atol=1e-10, err_msg=name)


def test_full_model_pred_head_knob_f64(x64):
    """pred_s2d_conv=True vs False through the COMPLETE flagship forward +
    gradients at float64 — execution form only."""
    from stereospike_tpu.models import forward_sequence, init_params, stereospike

    cfg_on = stereospike(in_hw=(48, 64), pred_s2d_conv=True)
    assert cfg_on.use_pred_s2d_conv
    cfg_off = dataclasses.replace(cfg_on, pred_s2d_conv=False)
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64),
        init_params(jax.random.PRNGKey(0), cfg_on))
    frames = jnp.asarray(np.random.default_rng(7).poisson(
        0.4, (2, 1, 48, 64, 4)).astype(np.float64))

    def loss(p, cfg):
        d, s, _ = forward_sequence(p, frames, cfg)
        return sum(jnp.sum(x ** 2) for x in d), d

    (l1, d1), g1 = jax.value_and_grad(loss, has_aux=True)(params, cfg_on)
    (l0, d0), g0 = jax.value_and_grad(loss, has_aux=True)(params, cfg_off)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-10)
    for a, b in zip(d1, d0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=jax.tree_util.keystr(path))


def test_multistep_pred_head_knob_f64(x64):
    """Same knob through the layer-major multistep path (T=3)."""
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.models.multistep import forward_multistep

    cfg_on = stereospike(in_hw=(48, 64), pred_s2d_conv=True)
    cfg_off = dataclasses.replace(cfg_on, pred_s2d_conv=False)
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64),
        init_params(jax.random.PRNGKey(1), cfg_on))
    frames = jnp.asarray(np.random.default_rng(8).poisson(
        0.4, (2, 3, 48, 64, 4)).astype(np.float64))

    d1, _, _ = forward_multistep(params, frames, cfg_on)
    d0, _, _ = forward_multistep(params, frames, cfg_off)
    for a, b in zip(d1, d0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)
