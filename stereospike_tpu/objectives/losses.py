"""Training losses: multiscale scale-invariant + gradient matching
(+ optional spike penalization).

Reference: ``/root/reference/network/loss.py``. Reformulated for XLA:
invalid GT pixels are a boolean mask instead of NaNs, every reduction is a
masked sum over static shapes, and the per-scale GT rescale is a mask-aware
bilinear resize (identity for the flagship, whose four heads all predict at
full resolution — loss.py:38,90 is a no-op there).

Formulas (n = number of valid pixels, res = (pred − gt) zeroed at invalid):

- scale-invariant (loss.py:7-24):   Σ res² / n  −  (Σ res)² / n²
- gradient matching (loss.py:44-75): Σ (|∂x res| + |∂y res|)·mask / n with
  3×3 Sobel filters, stride 1, zero padding 1
- spike penalization (loss.py:96-107): Σ_tensors Σ s² / (2·numel)
- total (loss.py:110-135): SI + α·GM (+ β·SP), defaults α=0.5,
  scale_weights=(1,1,1,1), β=1
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stereospike_tpu.nn.layers import bilinear_resize

Array = jax.Array


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _masked_residual(predicted: Array, groundtruth: Array, mask: Array,
                     axis_name: Optional[str] = None):
    """Residual + GLOBAL valid count. Under ``shard_map`` data parallelism
    (``axis_name`` set) the count is psum'd so batch-coupled statistics (n,
    the quad term) match the single-device loss exactly — per-shard losses
    averaged afterwards would not (n and quad are not linear in the batch).
    """
    maskf = mask.astype(predicted.dtype)
    n = jnp.maximum(_psum(jnp.sum(maskf), axis_name), 1.0)
    res = (predicted - groundtruth) * maskf
    return res, maskf, n


def scale_invariant_loss(predicted: Array, groundtruth: Array, mask: Array,
                         axis_name: Optional[str] = None) -> Array:
    """Masked scale-invariant MSE (loss.py:7-24). Distributed-exact when
    ``axis_name`` names a shard_map data axis."""
    res, _, n = _masked_residual(predicted, groundtruth, mask, axis_name)
    mse = _psum(jnp.sum(res * res), axis_name) / n
    quad = jnp.square(_psum(jnp.sum(res), axis_name)) / (n * n)
    return mse - quad


def _sobel_shift(res: Array):
    """Sobel x/y of [B, H, W, 1] maps via padded shifts (zero padding 1,
    cross-correlation orientation — identical to the reference's
    ``F.conv2d(res, sobel, padding=1)``). Shift-and-add stays on the VPU and
    fuses; a 1-channel conv wastes 127 of 128 MXU lanes."""
    h, w = res.shape[1], res.shape[2]
    z = jnp.pad(res, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def sh(dy: int, dx: int) -> Array:
        return z[:, 1 + dy:h + 1 + dy, 1 + dx:w + 1 + dx]

    left = sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)
    right = sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
    top = sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)
    bot = sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
    return left - right, top - bot


def gradient_matching_loss(predicted: Array, groundtruth: Array, mask: Array,
                           axis_name: Optional[str] = None) -> Array:
    """Masked Sobel gradient-matching L1 (loss.py:44-75). NHWC maps."""
    res, maskf, n = _masked_residual(predicted, groundtruth, mask, axis_name)
    gx, gy = _sobel_shift(res)
    return _psum(jnp.sum((jnp.abs(gx) + jnp.abs(gy)) * maskf), axis_name) / n


def resize_groundtruth(groundtruth: Array, mask: Array, size: Tuple[int, int]):
    """Mask-aware bilinear GT rescale (loss.py:38).

    The reference bilinearly interpolates NaN-laden GT, so any output pixel
    whose support touches an invalid input becomes NaN (→ invalid). Here:
    values = bilinear(gt·mask) and valid = bilinear(mask) == 1 (full valid
    support) — identical values on the valid set, no NaNs anywhere.
    """
    if groundtruth.shape[1:3] == tuple(size):
        return groundtruth, mask
    maskf = mask.astype(groundtruth.dtype)
    vals = bilinear_resize(groundtruth * maskf, size, align_corners=False)
    cover = bilinear_resize(maskf, size, align_corners=False)
    return vals, cover >= 1.0 - 1e-6


def multiscale_scale_invariant_loss(
    predicted: Sequence[Array], groundtruth: Array, mask: Array,
    factors: Optional[Sequence[float]] = None,
    axis_name: Optional[str] = None,
) -> Array:
    """Σ_scales factor · SI(pred_s, resize(gt)) (loss.py:27-41)."""
    factors = (1.0,) * len(predicted) if factors is None else factors
    total = 0.0
    for f, p in zip(factors, predicted):
        gt_s, m_s = resize_groundtruth(groundtruth, mask, p.shape[1:3])
        total = total + f * scale_invariant_loss(p, gt_s, m_s, axis_name)
    return total


def multiscale_gradient_matching_loss(
    predicted: Sequence[Array], groundtruth: Array, mask: Array,
    factors: Optional[Sequence[float]] = None,
    axis_name: Optional[str] = None,
) -> Array:
    """Σ_scales factor · GM(pred_s, resize(gt)) (loss.py:78-93)."""
    factors = (1.0,) * len(predicted) if factors is None else factors
    total = 0.0
    for f, p in zip(factors, predicted):
        gt_s, m_s = resize_groundtruth(groundtruth, mask, p.shape[1:3])
        total = total + f * gradient_matching_loss(p, gt_s, m_s, axis_name)
    return total


def spike_penalization_loss(spike_tensors: Sequence[Array],
                            axis_name: Optional[str] = None) -> Array:
    """Σ_tensors mean(s²)/2 — activity regularizer (loss.py:96-107)."""
    total = 0.0
    for s in spike_tensors:
        num = _psum(jnp.sum(s * s), axis_name)
        den = 2.0 * _psum(jnp.asarray(float(s.size)), axis_name)
        total = total + num / den
    return total


@dataclasses.dataclass(frozen=True)
class TotalLossConfig:
    """Defaults from loss.py:119 and train.py:128 (alpha=0.5 for metric depth)."""

    alpha: float = 0.5
    scale_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    penalize_spikes: bool = False
    beta: float = 1.0


def total_loss(
    predicted: Sequence[Array],
    groundtruth: Array,
    mask: Array,
    spike_tensors: Optional[Sequence[Array]] = None,
    cfg: TotalLossConfig = TotalLossConfig(),
    axis_name: Optional[str] = None,
) -> Array:
    """SI + α·GM (+ β·SP) over the prediction pyramid (loss.py:126-135).

    ``axis_name``: shard_map data axis for distributed-exact statistics.
    """
    w = cfg.scale_weights[: len(predicted)]
    out = multiscale_scale_invariant_loss(predicted, groundtruth, mask, w,
                                          axis_name)
    out = out + cfg.alpha * multiscale_gradient_matching_loss(
        predicted, groundtruth, mask, w, axis_name)
    if cfg.penalize_spikes:
        out = out + cfg.beta * spike_penalization_loss(spike_tensors or (),
                                                       axis_name)
    return out
