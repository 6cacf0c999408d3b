"""Depth metrics and label-space conversions.

Reference: ``/root/reference/network/metrics.py``. The reference encodes
invalid ground-truth pixels as NaN and relies on boolean indexing with
data-dependent shapes; NaN-in-data and dynamic shapes are both hostile to
XLA, so here ground truth travels as an explicit ``(values, valid_mask)``
pair with static shapes, and every reduction is a masked sum divided by the
valid count. The math is identical.

Constants (``metrics.py:6-9``): DISPARITY_MULTIPLIER = 7.0,
FOCAL_LENGTH_X_BASELINE['indoor_flying'] = 19.941772.
Log-depth (``metrics.py:48-80``): Dmax = 10, alpha = 6.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DISPARITY_MULTIPLIER = 7.0
FOCAL_LENGTH_X_BASELINE = {"indoor_flying": 19.941772}


def valid_mask_from_nan(groundtruth: Array) -> Tuple[Array, Array]:
    """Split NaN-encoded GT into (values-with-0-at-invalid, boolean mask).

    Host-side adapter from the reference's NaN convention
    (``mvsec_dataset.py:144``) to the framework's masked representation.
    """
    mask = ~jnp.isnan(groundtruth)
    return jnp.where(mask, groundtruth, 0.0), mask


def mask_invalid(predicted: Array, groundtruth: Array, mask: Array) -> Tuple[Array, Array]:
    """Zero both maps at invalid pixels (reference ``mask_dead_pixels``,
    metrics.py:12-29)."""
    return jnp.where(mask, predicted, 0.0), jnp.where(mask, groundtruth, 0.0)


def depth_to_disparity(depth: Array, scenario: str = "indoor_flying") -> Array:
    """metrics.py:32-40 (constants from the event-stereo ICCV19 protocol)."""
    return DISPARITY_MULTIPLIER * FOCAL_LENGTH_X_BASELINE[scenario] / (depth + 1e-15)


def disparity_to_depth(disparity: Array, scenario: str = "indoor_flying") -> Array:
    """metrics.py:43-45."""
    return DISPARITY_MULTIPLIER * FOCAL_LENGTH_X_BASELINE[scenario] / (disparity + 1e-7)


def lin_to_log_depths(depth_lin: Array, Dmax: float = 10.0, alpha: float = 6.0) -> Array:
    """Normalized log depth in [0, 1] (metrics.py:48-75)."""
    d = jnp.clip(depth_lin, 0.0, Dmax) / Dmax
    return jnp.clip(1.0 + jnp.log(d) / alpha, 0.0, 1.0)


def log_to_lin_depths(depth_log: Array, Dmax: float = 10.0, alpha: float = 6.0) -> Array:
    """Inverse of :func:`lin_to_log_depths` (metrics.py:78-80)."""
    return Dmax * jnp.exp(alpha * (depth_log - 1.0))


def convert_to_lin(x: Array, learn_on: str) -> Array:
    """Map a prediction/label from its learned metric back to linear depth
    (train.py:246-254 dispatch)."""
    if learn_on == "LIN":
        return x
    if learn_on == "LOG":
        return log_to_lin_depths(x)
    if learn_on == "DISP":
        return disparity_to_depth(x)
    raise ValueError("learn_on must be 'LIN', 'LOG' or 'DISP'")


def mean_depth_error(predicted: Array, groundtruth: Array, mask: Array,
                     axis_name=None) -> Array:
    """Mean absolute depth residual over valid pixels (metrics.py:83-95).
    ``axis_name``: psum the sums over a shard_map data axis (global MDE)."""
    mask = mask.astype(predicted.dtype)
    n = jnp.sum(mask)
    total = jnp.sum(jnp.abs((predicted - groundtruth) * mask))
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        total = jax.lax.psum(total, axis_name)
    return total / jnp.maximum(n, 1.0)
