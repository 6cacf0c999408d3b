"""Synthetic event-depth fixtures.

Random-AER / random-frame generators shaped exactly like the MVSEC pipeline
output, so training, evaluation, profiling and benchmarks run end-to-end
without the (multi-GB, not redistributable) MVSEC hdf5 files. Fills the
fake-dataset role the reference lacks entirely (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _smooth_depth(key: Array, batch: int, hw: Tuple[int, int],
                  d_min: float = 1.0, d_max: float = 6.0) -> Array:
    """Smooth random depth surface: low-res uniform noise, bilinear-upsampled."""
    from stereospike_tpu.nn.layers import bilinear_resize

    coarse = jax.random.uniform(key, (batch, 8, 11, 1), minval=d_min, maxval=d_max)
    return bilinear_resize(coarse, hw, align_corners=False)


def synthetic_batch(
    key: Array,
    batch: int = 1,
    in_hw: Tuple[int, int] = (260, 346),
    channels: int = 4,
    T: int = 1,
    rate: float = 0.35,
    invalid_frac: float = 0.15,
    dtype=jnp.float32,
) -> Dict[str, Array]:
    """One batch: Poisson event-count chunks + smooth GT + validity mask.

    Event density ``rate`` (~0.35 events/pixel/frame) is in the ballpark of
    MVSEC indoor_flying 50 ms windows.
    """
    k_ev, k_gt, k_mask = jax.random.split(key, 3)
    chunks = jax.random.poisson(
        k_ev, rate, (batch, T) + tuple(in_hw) + (channels,)).astype(dtype)
    gt = _smooth_depth(k_gt, batch, in_hw).astype(dtype)
    mask = jax.random.uniform(k_mask, gt.shape) >= invalid_frac
    gt = jnp.where(mask, gt, 0.0)
    return {"chunks": chunks, "gt": gt, "mask": mask}


def synthetic_stream(
    seed: int,
    num_batches: int,
    **kwargs,
) -> Iterator[Dict[str, Array]]:
    """Finite stream of synthetic batches (deterministic in ``seed``)."""
    key = jax.random.PRNGKey(seed)
    for i in range(num_batches):
        yield synthetic_batch(jax.random.fold_in(key, i), **kwargs)
