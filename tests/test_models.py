"""Model-family tests: shapes, param counts, cumulative-depth semantics,
state carry, gradient liveness across every variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.models import (
    AnnConfig,
    StereoSpikeConfig,
    ann_forward,
    count_params,
    firing_rates,
    forward,
    forward_sequence,
    init_ann_params,
    init_ann_state,
    init_params,
    init_state,
    stereospike,
    stereospike_cutpredict,
    stereospike_monocular,
    stereospike_noskip,
    stereospike_tempo,
)
from stereospike_tpu.models.stereospike import TAP_NAMES

SMALL = dict(in_hw=(64, 88))  # fast CPU shapes; pyramid 64/32/16/8/4


def _frame(cfg, batch=2, seed=0):
    k = jax.random.PRNGKey(seed)
    # Poisson-ish event counts: mostly 0/1/2 spikes, enough to drive activity
    return jax.random.poisson(
        k, 0.5, (batch,) + cfg.in_hw + (cfg.in_channels,)
    ).astype(jnp.float32)


def test_reference_pyramid_sizes():
    cfg = StereoSpikeConfig()
    assert cfg.sizes == ((260, 346), (130, 173), (65, 87), (33, 44), (17, 22))
    assert cfg.channels == (32, 64, 128, 256, 512)


def test_param_count_matches_reference_arithmetic():
    """Analytic count of the torch reference (SNN_models.py:63-150):
    conv k5 per level + 2 SEW blocks (4x conv3 512^2) + 4 deconv k5 +
    4 biased k3 heads."""
    cfg = stereospike()
    params = init_params(jax.random.PRNGKey(0), cfg)
    convs = 25 * (4 * 32 + 32 * 64 + 64 * 128 + 128 * 256 + 256 * 512)
    sew = 4 * 9 * 512 * 512
    deconvs = 25 * (512 * 256 + 256 * 128 + 128 * 64 + 64 * 32)
    heads = (9 * 256 + 1) + (9 * 128 + 1) + (9 * 64 + 1) + (9 * 32 + 1)
    assert count_params(params) == convs + sew + deconvs + heads == 18148708


def test_tempo_has_plif_scalars():
    cfg = stereospike_tempo(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert set(params["plif"]) == {
        "bottom", "conv1", "conv2", "conv3", "conv4",
        "deconv4", "deconv3", "deconv2", "deconv1",
        "sew1_a", "sew1_b", "sew2_a", "sew2_b",
    }


@pytest.mark.parametrize("factory", [stereospike, stereospike_tempo,
                                     stereospike_monocular, stereospike_noskip])
def test_forward_shapes(factory):
    cfg = factory(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _frame(cfg)
    depths, spikes, state = jax.jit(
        lambda p, x: forward(p, x, cfg), static_argnums=()
    )(params, x)
    assert len(depths) == 4
    for d in depths:
        assert d.shape == (2, 64, 88, 1)
    assert len(spikes) == 5
    assert spikes[0].shape == (2, 4, 6, 512)   # out_rconv at bottleneck
    assert spikes[-1].shape == (2, 64, 88, 32)  # out_add1 at full res
    # spiking tensors from skips are integer sums of {0,1} spikes
    assert float(jnp.min(spikes[-1])) >= 0.0


def test_cutpredict_returns_three_depths():
    cfg = stereospike_cutpredict(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    depths, spikes, _ = forward(params, _frame(cfg), cfg)
    assert len(depths) == 3  # [depth1, depth2, depth3]; deepest head removed


def test_depths_are_cumulative():
    """depth_k = depth_{k+1} + head_k charge: zeroing heads 1..3 makes all
    four depths equal (the reference's shared-I-neuron accumulation,
    SNN_models.py:170-188)."""
    cfg = stereospike(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    for s in (1, 2, 3):
        params[f"pred{s}"] = jax.tree.map(jnp.zeros_like, params[f"pred{s}"])
    depths, _, _ = forward(params, _frame(cfg), cfg)
    for d in depths[:3]:
        np.testing.assert_array_equal(np.asarray(d), np.asarray(depths[3]))


def test_depth_integrator_initial_potential():
    """set_init_depths_potentials equivalent: seeding state['Ineurons']
    offsets every depth by that prior."""
    cfg = stereospike(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _frame(cfg)
    d0, _, _ = forward(params, x, cfg)
    state = init_state(cfg, 2)
    state["Ineurons"] = state["Ineurons"] + 7.5
    d1, _, _ = forward(params, x, cfg, state)
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d0[0]) + 7.5, rtol=1e-5)


def test_noskip_differs_from_skip():
    cfg_s = stereospike_tempo(**SMALL)
    cfg_n = stereospike_tempo(use_skips=False, **SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg_s)
    x = _frame(cfg_s)
    d_s, _, _ = forward(params, x, cfg_s)
    d_n, _, _ = forward(params, x, cfg_n)
    assert not np.allclose(np.asarray(d_s[0]), np.asarray(d_n[0]))


def test_forward_sequence_carries_state():
    cfg = stereospike_tempo(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.stack([_frame(cfg, seed=i) for i in range(3)], axis=1)
    depths, spikes, final_state = forward_sequence(params, frames, cfg)
    assert depths[0].shape == (2, 64, 88, 1)
    # depth integrator accumulated over 3 steps x 4 heads: equals last depth1
    np.testing.assert_allclose(np.asarray(final_state["Ineurons"]),
                               np.asarray(depths[0]), rtol=1e-6)
    # stateless single-step != stateful last-step (states carried over)
    d_single, _, _ = forward(params, frames[:, -1], cfg)
    assert not np.allclose(np.asarray(d_single[0]), np.asarray(depths[0]))


def test_firing_rates_taps():
    cfg = stereospike(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rates = firing_rates(params, _frame(cfg), cfg)
    assert set(rates) == set(TAP_NAMES)
    for name, r in rates.items():
        assert 0.0 <= float(r) <= 1.0, name
    assert float(rates["out_bottom"]) > 0.0  # network actually spikes


@pytest.mark.parametrize("factory", [stereospike, stereospike_tempo])
def test_gradients_reach_all_params(factory):
    # multiply_factor=10 + low threshold keep spike activity alive through
    # every layer at this tiny test resolution (with the flagship's default
    # multiply_factor=1.0 and weak synthetic input, deep layers emit zero
    # spikes and their weight grads are exactly zero — the vanishing-spike
    # failure mode MultiplyBy exists to fight, blocks.py:90). This test is
    # about gradient plumbing, not calibration.
    cfg = factory(**SMALL, multiply_factor=10.0, v_threshold=0.25)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = _frame(cfg)

    def loss(p):
        depths, spikes, _ = forward(p, x, cfg)
        return sum(jnp.sum(d ** 2) for d in depths) + 0.01 * sum(
            jnp.sum(s) for s in spikes)

    grads = jax.grad(loss)(params)
    dead = [
        path for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if not np.any(np.asarray(g))
    ]
    assert not dead, f"dead params: {dead}"


def test_ann_forward_shapes_and_bn_state():
    cfg = AnnConfig(in_hw=(64, 88))
    params = init_ann_params(jax.random.PRNGKey(0), cfg)
    state = init_ann_state(cfg)
    x = _frame(cfg.skeleton)
    depths, new_state = ann_forward(params, x, cfg, state, train=True)
    assert len(depths) == 4 and depths[0].shape == (2, 64, 88, 1)
    # train mode updates running stats
    assert not np.allclose(np.asarray(new_state["bn_bottom"]["mean"]),
                           np.asarray(state["bn_bottom"]["mean"]))
    # eval mode leaves them untouched and is deterministic
    d_eval, st2 = ann_forward(params, x, cfg, new_state, train=False)
    np.testing.assert_array_equal(np.asarray(st2["bn_bottom"]["mean"]),
                                  np.asarray(new_state["bn_bottom"]["mean"]))


def test_s2d_level0_is_pure_layout_change():
    """The s2d-canonical level-0 execution profile (s2d_level0=True, the
    default) must be a pure layout change: in float64 depths, spikes and
    integrator state match the plain layout to ~1e-9 (float32 only agrees
    to spiking tolerance — reassociated conv sums can flip a
    threshold-boundary spike)."""
    import dataclasses

    jax.config.update("jax_enable_x64", True)
    try:
        cfg = stereospike(in_hw=(48, 64))
        assert cfg.use_s2d_level0
        cfg_plain = dataclasses.replace(cfg, s2d_level0=False)
        params = jax.tree.map(
            lambda x: x.astype(jnp.float64),
            init_params(jax.random.PRNGKey(0), cfg))
        rng = np.random.default_rng(9)
        frames = jnp.asarray(
            rng.poisson(0.5, (2, 2, 48, 64, 4)).astype(np.float64))
        d_s2d, s_s2d, st_s2d = forward_sequence(params, frames, cfg)
        d_pl, s_pl, st_pl = forward_sequence(params, frames, cfg_plain)
        for a, b in zip(d_s2d, d_pl):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-9)
        for a, b in zip(s_s2d, s_pl):
            assert a.shape == b.shape  # public contract stays canonical
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(st_s2d["Ineurons"]),
                                   np.asarray(st_pl["Ineurons"]),
                                   rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_s2d_level0_auto_disables_for_odd_hw():
    cfg = stereospike(in_hw=(47, 64))
    assert not cfg.use_s2d_level0
    params = init_params(jax.random.PRNGKey(0), cfg)
    frame = jnp.zeros((1, 47, 64, 4))
    depths, _, _ = forward(params, frame, cfg)
    assert depths[0].shape == (1, 47, 64, 1)
