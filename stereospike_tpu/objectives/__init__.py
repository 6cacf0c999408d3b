"""Losses and metrics (masked, static-shape, jit-friendly)."""

from stereospike_tpu.objectives.losses import (  # noqa: F401
    scale_invariant_loss,
    gradient_matching_loss,
    spike_penalization_loss,
    multiscale_scale_invariant_loss,
    multiscale_gradient_matching_loss,
    total_loss,
    TotalLossConfig,
)
from stereospike_tpu.objectives.metrics import (  # noqa: F401
    mean_depth_error,
    valid_mask_from_nan,
    mask_invalid,
    depth_to_disparity,
    disparity_to_depth,
    lin_to_log_depths,
    log_to_lin_depths,
    convert_to_lin,
    DISPARITY_MULTIPLIER,
    FOCAL_LENGTH_X_BASELINE,
)
