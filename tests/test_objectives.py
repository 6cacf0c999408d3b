"""Golden tests for losses/metrics against NaN-semantics torch formulas.

The torch code below independently implements the published formulas
(scale-invariant loss, Sobel gradient matching, MDE) with the reference's
NaN-masking convention, then we check our masked static-shape versions give
identical numbers.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stereospike_tpu.objectives import (
    DISPARITY_MULTIPLIER,
    FOCAL_LENGTH_X_BASELINE,
    TotalLossConfig,
    convert_to_lin,
    depth_to_disparity,
    disparity_to_depth,
    gradient_matching_loss,
    lin_to_log_depths,
    log_to_lin_depths,
    mean_depth_error,
    multiscale_gradient_matching_loss,
    scale_invariant_loss,
    spike_penalization_loss,
    total_loss,
    valid_mask_from_nan,
)


def _fixture(seed=0, shape=(2, 1, 12, 17), nan_frac=0.3):
    """Random pred + NaN-laden GT in NCHW, plus NHWC jax versions."""
    rng = np.random.default_rng(seed)
    pred = rng.normal(2.0, 1.0, size=shape).astype(np.float32)
    gt = rng.normal(2.0, 1.0, size=shape).astype(np.float32)
    nan_mask = rng.random(shape) < nan_frac
    gt[nan_mask] = np.nan
    pred_j = jnp.asarray(np.transpose(pred, (0, 2, 3, 1)))
    gt_j, mask_j = valid_mask_from_nan(jnp.asarray(np.transpose(gt, (0, 2, 3, 1))))
    return pred, gt, pred_j, gt_j, mask_j


def _torch_si(pred, gt):
    mask = ~torch.isnan(gt)
    n = mask.sum()
    res = torch.where(mask, pred - gt, torch.zeros(()))
    return (res[mask] ** 2).sum() / n - res[mask].sum() ** 2 / n ** 2


def _torch_gm(pred, gt):
    mask = ~torch.isnan(gt)
    n = mask.sum()
    res = torch.where(mask, pred - gt, torch.zeros(()))
    sx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=pred.dtype).view(1, 1, 3, 3)
    sy = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=pred.dtype).view(1, 1, 3, 3)
    gx = F.conv2d(res, sx, padding=1) * mask
    gy = F.conv2d(res, sy, padding=1) * mask
    return (gx.abs()[mask] + gy.abs()[mask]).sum() / n


def _torch_mde(pred, gt):
    mask = ~torch.isnan(gt)
    res = torch.where(mask, pred - gt, torch.zeros(()))
    return res.abs()[mask].sum() / mask.sum()


def test_scale_invariant_matches_nan_formula():
    pred, gt, pred_j, gt_j, mask_j = _fixture()
    ref = float(_torch_si(torch.tensor(pred), torch.tensor(gt)))
    ours = float(scale_invariant_loss(pred_j, gt_j, mask_j))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_gradient_matching_matches_nan_formula():
    pred, gt, pred_j, gt_j, mask_j = _fixture(seed=1)
    ref = float(_torch_gm(torch.tensor(pred), torch.tensor(gt)))
    ours = float(gradient_matching_loss(pred_j, gt_j, mask_j))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_mde_matches_nan_formula():
    pred, gt, pred_j, gt_j, mask_j = _fixture(seed=2)
    ref = float(_torch_mde(torch.tensor(pred), torch.tensor(gt)))
    ours = float(mean_depth_error(pred_j, gt_j, mask_j))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_all_invalid_is_finite():
    pred = jnp.ones((1, 4, 5, 1))
    gt = jnp.zeros((1, 4, 5, 1))
    mask = jnp.zeros((1, 4, 5, 1), bool)
    assert np.isfinite(float(scale_invariant_loss(pred, gt, mask)))
    assert float(mean_depth_error(pred, gt, mask)) == 0.0


def test_spike_penalization():
    s1 = jnp.full((2, 4), 2.0)  # mean(s^2)/2 = 2.0
    s2 = jnp.zeros((3, 3))
    np.testing.assert_allclose(float(spike_penalization_loss([s1, s2])), 2.0)


def test_total_loss_composition():
    pred, gt, pred_j, gt_j, mask_j = _fixture(seed=3)
    preds = [pred_j, pred_j * 0.9, pred_j * 1.1, pred_j * 0.5]
    si = sum(float(scale_invariant_loss(p, gt_j, mask_j)) for p in preds)
    gm = sum(float(gradient_matching_loss(p, gt_j, mask_j)) for p in preds)
    tot = float(total_loss(preds, gt_j, mask_j))
    np.testing.assert_allclose(tot, si + 0.5 * gm, rtol=1e-5)
    # spike penalization path
    spk = [jnp.ones((2, 2))]
    tot2 = float(total_loss(preds, gt_j, mask_j, spk,
                            TotalLossConfig(penalize_spikes=True, beta=2.0)))
    np.testing.assert_allclose(tot2, tot + 2.0 * 0.5, rtol=1e-5)


def test_multiscale_resizes_gt_when_needed():
    """Lower-resolution prediction triggers mask-aware GT resize; invalid
    support propagates like NaN interpolation in the reference."""
    _, _, pred_j, gt_j, mask_j = _fixture(seed=4, shape=(1, 1, 16, 20))
    small = pred_j[:, ::2, ::2, :]
    out = float(multiscale_gradient_matching_loss([small], gt_j, mask_j))
    assert np.isfinite(out) and out > 0


def test_depth_conversions_roundtrip():
    d = jnp.linspace(0.5, 9.5, 19)
    np.testing.assert_allclose(np.asarray(log_to_lin_depths(lin_to_log_depths(d))),
                               np.asarray(d), rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(disparity_to_depth(depth_to_disparity(d))), np.asarray(d), rtol=1e-4)
    # constants pinned to the reference (metrics.py:6-9)
    assert DISPARITY_MULTIPLIER == 7.0
    assert FOCAL_LENGTH_X_BASELINE["indoor_flying"] == 19.941772


def test_lin_to_log_range_and_torch_parity():
    d = np.linspace(0.01, 12.0, 50).astype(np.float32)
    ours = np.asarray(lin_to_log_depths(jnp.asarray(d)))
    ref = np.clip(1.0 + np.log(np.clip(d, 0, 10.0) / 10.0) / 6.0, 0, 1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
    assert ours.min() >= 0.0 and ours.max() <= 1.0


def test_convert_to_lin_dispatch():
    d = jnp.asarray([1.0, 2.0])
    np.testing.assert_allclose(np.asarray(convert_to_lin(d, "LIN")), [1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(convert_to_lin(lin_to_log_depths(d), "LOG")), np.asarray(d), rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(convert_to_lin(depth_to_disparity(d), "DISP")), np.asarray(d), rtol=1e-4)
    with pytest.raises(ValueError):
        convert_to_lin(d, "XXX")
