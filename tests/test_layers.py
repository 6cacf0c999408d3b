"""Parity tests of low-level layers against torch operator semantics.

The reference model is defined in torch (conv/padding, UpsamplingNearest2d,
F.interpolate); these tests pin our NHWC/HWIO implementations to the exact
same math on random inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stereospike_tpu.nn.layers import (
    bilinear_resize,
    conv2d,
    conv_init,
    nearest_upsample,
    upsample_conv,
)


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def _to_nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _w_hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


@pytest.mark.parametrize("stride,padding,k", [(1, 2, 5), (2, 2, 5), (1, 1, 3), (1, 0, 3)])
def test_conv2d_matches_torch(stride, padding, k):
    x = _rand(2, 3, 13, 17)
    w = _rand(4, 3, k, k, seed=1)
    b = _rand(4, seed=2)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=stride, padding=padding).numpy()
    out = conv2d(_to_nhwc(x), _w_hwio(w), jnp.asarray(b), stride=stride, padding=padding)
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((17, 22), (37, 48)), ((33, 44), (69, 91)),
                                          ((130, 173), (264, 350)), ((5, 7), (5, 7))])
def test_nearest_upsample_matches_torch(in_hw, out_hw):
    x = _rand(1, 2, *in_hw)
    ref = F.interpolate(torch.tensor(x), size=out_hw, mode="nearest").numpy()
    out = nearest_upsample(_to_nhwc(x), out_hw)
    np.testing.assert_array_equal(_from_nhwc(out), ref)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [((17, 22), (37, 48)), ((65, 87), (33, 44)),
                                          ((4, 5), (9, 11))])
def test_bilinear_resize_matches_torch(align, in_hw, out_hw):
    x = _rand(2, 3, *in_hw)
    ref = F.interpolate(torch.tensor(x), size=out_hw, mode="bilinear",
                        align_corners=align).numpy()
    out = bilinear_resize(_to_nhwc(x), out_hw, align_corners=align)
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_upsample_conv_matches_reference_composite(mode):
    """NNConvUpsampling / BilinConvUpsampling: resize to target+(k-1), VALID conv."""
    k, target = 5, (33, 44)
    x = _rand(1, 8, 17, 22)
    w = _rand(4, 8, k, k, seed=3)
    xt, wt = torch.tensor(x), torch.tensor(w)
    up_size = (target[0] + k - 1, target[1] + k - 1)
    if mode == "nearest":
        up = F.interpolate(xt, size=up_size, mode="nearest")
    else:
        up = F.interpolate(xt, size=up_size, mode="bilinear", align_corners=True)
    ref = F.conv2d(up, wt, stride=1, padding=0).numpy()
    out = upsample_conv(_to_nhwc(x), _w_hwio(w), target_hw=target, mode=mode)
    assert out.shape[1:3] == target
    np.testing.assert_allclose(_from_nhwc(out), ref, rtol=1e-4, atol=5e-5)


def test_conv_init_matches_torch_default_distribution():
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)
    p = conv_init(jax.random.PRNGKey(0), 5, 32, 64, bias=True)
    fan_in = 32 * 5 * 5
    bound = 1.0 / np.sqrt(fan_in)
    w = np.asarray(p["w"])
    assert w.shape == (5, 5, 32, 64)
    assert w.min() >= -bound and w.max() <= bound
    # uniform on [-b, b] has std b/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)
    b = np.asarray(p["b"])
    assert b.shape == (64,) and np.abs(b).max() <= bound


def test_conv2d_bf16_accumulates_fp32():
    x = jnp.ones((1, 8, 8, 128), jnp.bfloat16)
    w = jnp.full((1, 1, 128, 4), 0.01, jnp.bfloat16)
    out = conv2d(x, w, padding=0)
    assert out.dtype == jnp.bfloat16
    # 128 * 0.01 = 1.28; pure-bf16 accumulation would lose this precision badly
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.full((1, 8, 8, 4), 1.28, np.float32),
                               rtol=2e-2)


def test_nearest_upsample_custom_vjp_matches_gather_grad():
    """The scatter-free backward (cumsum + boundary diffs) must equal the
    autodiff transpose of a plain gather implementation."""
    from stereospike_tpu.nn.layers import _nearest_indices

    x = jnp.asarray(_rand(2, 9, 11, 3, seed=7))

    def plain_gather(x, size):
        hi = jnp.asarray(_nearest_indices(x.shape[1], size[0]))
        wi = jnp.asarray(_nearest_indices(x.shape[2], size[1]))
        return x[:, hi][:, :, wi]

    for size in [(20, 25), (9, 25), (4, 5)]:  # up, mixed, down
        f1 = lambda x: jnp.sum(nearest_upsample(x, size) ** 2)
        f2 = lambda x: jnp.sum(plain_gather(x, size) ** 2)
        np.testing.assert_allclose(float(f1(x)), float(f2(x)), rtol=1e-6)
        g1 = jax.grad(f1)(x)
        g2 = jax.grad(f2)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)


def test_upsample_conv_1out_factorized_matches_naive():
    """The factorized C_out=1 head path must equal upsample-then-conv."""
    from stereospike_tpu.nn.layers import _upsample_conv_1out

    for k, in_hw, target in [(3, (9, 11), (20, 25)), (3, (33, 44), (65, 87)),
                             (5, (9, 11), (20, 25))]:
        x = jnp.asarray(_rand(2, 8, *in_hw, seed=11).transpose(0, 2, 3, 1))
        w = jnp.asarray(_rand(1, 8, k, k, seed=12).transpose(2, 3, 1, 0))
        b = jnp.asarray(_rand(1, seed=13))
        up = nearest_upsample(x, (target[0] + k - 1, target[1] + k - 1))
        naive = conv2d(up, w, b, stride=1, padding=0)
        fast = _upsample_conv_1out(x, w, b, target)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                                   rtol=1e-4, atol=1e-5)
        # gradients agree too
        g1 = jax.grad(lambda x: jnp.sum(_upsample_conv_1out(x, w, b, target) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(conv2d(
            nearest_upsample(x, (target[0] + k - 1, target[1] + k - 1)),
            w, b, stride=1, padding=0) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-4)


def test_upsample_conv_phase_stacked_matches_naive():
    """The phase-stacked small-C_out decoder path (forward + custom-VJP
    backward) must equal plain upsample-then-conv exactly."""
    from stereospike_tpu.nn.layers import _upsample_conv_phased

    from stereospike_tpu.nn.layers import _phase_factors

    # pin the factor-selection policy itself (2 per even axis, capped at
    # 128 stacked lanes, W-phase dropped first)
    assert _phase_factors((14, 18), 6) == (2, 2)
    assert _phase_factors((14, 18), 32) == (2, 2)   # 4*32 = 128 still fits
    assert _phase_factors((14, 18), 64) == (2, 1)   # 256 > 128 -> drop px
    assert _phase_factors((12, 13), 40) == (2, 1)   # W odd -> H-only
    assert _phase_factors((13, 13), 40) == (1, 1)   # both odd -> plain
    assert _phase_factors((14, 18), 256) == (1, 1)  # never fits -> plain

    cases = [
        # (k, ci, co, in_hw, target)
        (5, 8, 6, (7, 9), (14, 18)),
        (5, 8, 32, (7, 9), (14, 18)),
        (5, 8, 40, (6, 7), (12, 13)),
        (3, 8, 6, (7, 9), (14, 18)),
    ]
    for k, ci, co, in_hw, target in cases:
        py, px = _phase_factors(target, co)
        assert (py, px) != (1, 1)
        x = jnp.asarray(_rand(2, ci, *in_hw, seed=21).transpose(0, 2, 3, 1))
        w = jnp.asarray(_rand(co, ci, k, k, seed=22).transpose(2, 3, 1, 0))
        b = jnp.asarray(_rand(co, seed=23))
        up = nearest_upsample(x, (target[0] + k - 1, target[1] + k - 1))
        naive = conv2d(up, w, b, stride=1, padding=0)
        fast = _upsample_conv_phased(x, w, target, py, px) + b
        np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                                   rtol=1e-5, atol=1e-5)
        # the dispatcher picks the phased path for these configs
        disp = upsample_conv(x, w, b, target_hw=target, phase=True)
        np.testing.assert_allclose(np.asarray(disp), np.asarray(fast),
                                   rtol=0, atol=0)
        # custom-VJP grads equal the plain path's autodiff grads
        gx1, gw1 = jax.grad(
            lambda x, w: jnp.sum(_upsample_conv_phased(x, w, target, py, px) ** 2),
            argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(
            lambda x, w: jnp.sum(conv2d(
                nearest_upsample(x, (target[0] + k - 1, target[1] + k - 1)),
                w, stride=1, padding=0) ** 2), argnums=(0, 1))(x, w)
        # XLA may partition the reductions differently (e.g. over the 8
        # virtual test devices), so allow float reassociation noise relative
        # to the gradient scale (values are O(1e3) here)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=1e-4, atol=1e-3)
