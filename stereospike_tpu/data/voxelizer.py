"""Device-side event voxelizer: rectification gather + scatter-add binning.

Replaces the reference's two per-event Python hot loops (SURVEY.md §3.1):

- ``mvsecRectifyEvents`` (``datasets/MVSEC/utils.py:31-56``): per-event map
  lookup + FOV filter → here a vectorized gather through the precomputed
  rectification maps with a validity mask.
- ``mvsecCumulateSpikesIntoFrames`` (``utils.py:215-281``): per-event frame
  accumulation → here one scatter-add (segment-sum) into a
  ``[n_frames, H, W, 2]`` tensor.

Both are jit-compiled with static shapes: event streams are passed as
fixed-size padded arrays with a validity mask (invalid rows scatter into a
dump bin that is sliced off). Frame layout is NHWC-style ``[..., H, W, 2]``
with channel 0 = ON, channel 1 = OFF (reference ``utils.py:271-274``).

Timing semantics (``utils.py:242-260``): after removing the first-event time
offset, frame f covers ``(f·dt, (f+1)·dt)`` with dt = 50 ms / nfpdm on a
uniform grid — the reference uses exclusive bounds on both ends (events on a
measure-zero boundary set differ; we floor-assign).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

FRAME_H = 260
FRAME_W = 346
LIDAR_FPS = 20.0  # ground-truth depth maps at 20 Hz (utils.py:9)


def relativize_events(events: np.ndarray,
                      t0: Optional[float] = None) -> Tuple[np.ndarray, float]:
    """Remove the time offset at full precision, then narrow to float32.

    Raw MVSEC timestamps are ROS epoch seconds (~1.5e9), where float32
    resolution is ~128 s: a float32 cast before the offset removal collapses
    a whole sequence into one or two distinct times. The reference subtracts
    the first-spike time in float64 (``utils.py:246-249``); this helper does
    the same and returns (float32 events with relative times, new t0 = 0.0).
    """
    events = np.asarray(events)
    t0 = float(events[0, 2]) if t0 is None else float(t0)
    out = np.empty(events.shape, np.float32)
    out[:, 0] = events[:, 0]
    out[:, 1] = events[:, 1]
    out[:, 2] = (events[:, 2].astype(np.float64) - t0).astype(np.float32)
    out[:, 3] = events[:, 3]
    return out, 0.0


def rectify_events(
    events: Array,
    x_map: Array,
    y_map: Array,
    valid: Optional[Array] = None,
    *,
    width: int = FRAME_W,
    height: int = FRAME_H,
) -> Tuple[Array, Array]:
    """Rectify event coordinates through per-camera calibration maps.

    ``events``: [N, 4] float (x, y, t, p) — raw DVS coordinates.
    ``x_map``/``y_map``: [H, W] float rectified coordinate of each raw pixel.
    Returns (rectified events [N, 4], valid mask [N]); events mapping outside
    the H×W field of view are masked out, not dropped (static shapes).
    """
    x = events[:, 0].astype(jnp.int32)
    y = events[:, 1].astype(jnp.int32)
    in_raw = (x >= 0) & (x < width) & (y >= 0) & (y < height)
    xc = jnp.clip(x, 0, width - 1)
    yc = jnp.clip(y, 0, height - 1)
    x_rect = x_map[yc, xc]
    y_rect = y_map[yc, xc]
    ok = (
        in_raw
        & (x_rect >= 0) & (x_rect < width)
        & (y_rect >= 0) & (y_rect < height)
    )
    if valid is not None:
        ok = ok & valid
    rect = jnp.stack(
        [x_rect.astype(events.dtype), y_rect.astype(events.dtype),
         events[:, 2], events[:, 3]], axis=1)
    return rect, ok


@functools.partial(
    jax.jit, static_argnames=("n_frames", "height", "width", "polarity_encoding"))
def events_to_frames(
    events: Array,
    valid: Array,
    t0: Array,
    dt: Array,
    *,
    n_frames: int,
    height: int = FRAME_H,
    width: int = FRAME_W,
    polarity_encoding: str = "binary",
) -> Array:
    """Scatter events into ``[n_frames, height, width, 2]`` count frames.

    ``events``: [N, 4] (x, y, t, p); ``valid``: [N] bool; frame index =
    floor((t - t0)/dt). ``polarity_encoding``: 'binary' (MVSEC: ON p==1,
    OFF otherwise — utils.py:271) or 'signed' (DENSE: ON p==+1, OFF p==-1,
    p==0 ignored — dense_dataset.py:53-56).
    """
    x = jnp.floor(events[:, 0]).astype(jnp.int32)
    y = jnp.floor(events[:, 1]).astype(jnp.int32)
    t = events[:, 2]
    p = events[:, 3]

    f = jnp.floor((t - t0) / dt).astype(jnp.int32)
    if polarity_encoding == "binary":
        pol = jnp.where(p == 1, 0, 1)
        pol_ok = jnp.ones_like(valid)
    elif polarity_encoding == "signed":
        pol = jnp.where(p == 1, 0, 1)
        pol_ok = (p == 1) | (p == -1)
    else:
        raise ValueError(polarity_encoding)

    ok = (
        valid & pol_ok
        & (f >= 0) & (f < n_frames)
        & (x >= 0) & (x < width)
        & (y >= 0) & (y < height)
    )

    n_bins = n_frames * height * width * 2
    flat = ((f * height + y) * width + x) * 2 + pol
    flat = jnp.where(ok, flat, n_bins)  # dump bin for masked rows

    counts = jnp.zeros((n_bins + 1,), jnp.float32)
    counts = counts.at[flat].add(1.0, mode="drop")
    return counts[:-1].reshape(n_frames, height, width, 2)


def voxelize_sequence(
    events: np.ndarray,
    n_chunks: int,
    nfpdm: int = 1,
    *,
    x_map: Optional[np.ndarray] = None,
    y_map: Optional[np.ndarray] = None,
    height: int = FRAME_H,
    width: int = FRAME_W,
    block: int = 1 << 22,
    polarity_encoding: str = "binary",
    t0: Optional[float] = None,
) -> np.ndarray:
    """Host wrapper: full event stream → ``[n_chunks, nfpdm, H, W, 2]``.

    Streams the (possibly 100M-row) event array through the device scatter
    kernel in fixed-size blocks, accumulating on device. Optionally fuses
    rectification (``x_map``/``y_map``). ``t0`` defaults to the first event
    time (the reference's offset removal, utils.py:246-249).
    """
    events = np.asarray(events)
    t0 = float(events[0, 2]) if t0 is None else float(t0)
    if events.dtype != np.float32:
        # float64 input = raw absolute timestamps: remove the offset at full
        # precision before narrowing (float32 input is assumed pre-relativized)
        events, t0 = relativize_events(events, t0)
    n_frames = n_chunks * nfpdm
    dt = 1.0 / (LIDAR_FPS * nfpdm)
    # right-size the scatter buffer: padding a short stream to a huge block
    # wastes compile time and scatter bandwidth
    if events.shape[0] < block:
        block = max(1024, 1 << int(np.ceil(np.log2(max(events.shape[0], 2)))))

    maps = None
    if x_map is not None:
        maps = (jnp.asarray(x_map, jnp.float32), jnp.asarray(y_map, jnp.float32))

    @jax.jit
    def accumulate(acc, ev, valid):
        if maps is not None:
            ev, valid = rectify_events(ev, maps[0], maps[1], valid,
                                       width=width, height=height)
        frames = events_to_frames(
            ev, valid, jnp.float32(t0), jnp.float32(dt),
            n_frames=n_frames, height=height, width=width,
            polarity_encoding=polarity_encoding)
        return acc + frames

    acc = jnp.zeros((n_frames, height, width, 2), jnp.float32)
    n = events.shape[0]
    for start in range(0, n, block):
        ev = events[start:start + block]
        pad = block - ev.shape[0]
        valid = np.ones(ev.shape[0], bool)
        if pad:
            ev = np.pad(ev, ((0, pad), (0, 0)))
            valid = np.pad(valid, (0, pad))
        acc = accumulate(acc, jnp.asarray(ev), jnp.asarray(valid))

    out = np.asarray(acc).reshape(n_chunks, nfpdm, height, width, 2)
    return out
