"""Visualization: prediction/GT/error panels and video export.

Reference ``viz.py``: a 4-panel matplotlib figure (input spike histogram
with ON=red / OFF=blue / both=pink, prediction, ground truth, absolute
error map), figure→numpy conversion, and PNG-folder→mp4 assembly
(``viz.py:10-122``). Headless here (Agg backend), arrays are NHWC.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def event_frame_to_rgb(frame: np.ndarray) -> np.ndarray:
    """2-channel event count frame [H, W, 2] → RGB uint8 (ON=red, OFF=blue,
    both=pink; reference viz.py:44-55 / dense_dataset.py:74-97)."""
    on = frame[..., 0] > 0
    off = frame[..., 1] > 0
    rgb = np.zeros(frame.shape[:2] + (3,), np.uint8)
    rgb[on & ~off] = (255, 0, 0)
    rgb[off & ~on] = (0, 0, 255)
    rgb[on & off] = (255, 25, 255)
    return rgb


def show_learning(
    chunk: np.ndarray,
    prediction: np.ndarray,
    groundtruth: np.ndarray,
    mask: Optional[np.ndarray] = None,
    title: str = "",
) -> np.ndarray:
    """Build the 4-panel figure and return it as an RGB array.

    ``chunk``: [H, W, C>=2] event counts (first two channels used);
    ``prediction``/``groundtruth``/``mask``: [H, W] or [H, W, 1].
    """
    pred = np.asarray(prediction).squeeze()
    gt = np.asarray(groundtruth).squeeze()
    m = np.ones_like(gt, bool) if mask is None else np.asarray(mask).squeeze().astype(bool)
    err = np.where(m, np.abs(pred - gt), 0.0)

    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    fig.suptitle(title)
    axes[0, 0].imshow(event_frame_to_rgb(np.asarray(chunk)[..., :2]))
    axes[0, 0].set_title("input events")
    im1 = axes[0, 1].imshow(pred, cmap="viridis")
    axes[0, 1].set_title("prediction")
    fig.colorbar(im1, ax=axes[0, 1], fraction=0.03)
    im2 = axes[1, 0].imshow(np.where(m, gt, np.nan), cmap="viridis")
    axes[1, 0].set_title("ground truth")
    fig.colorbar(im2, ax=axes[1, 0], fraction=0.03)
    im3 = axes[1, 1].imshow(err, cmap="magma")
    axes[1, 1].set_title("|error|")
    fig.colorbar(im3, ax=axes[1, 1], fraction=0.03)
    for ax in axes.flat:
        ax.axis("off")
    out = fig_to_array(fig)
    plt.close(fig)
    return out


def fig_to_array(fig) -> np.ndarray:
    """Figure → RGB uint8 array (reference get_img_from_fig, viz.py:10-27)."""
    fig.canvas.draw()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    return buf.reshape(h, w, 4)[..., :3].copy()


def save_panel(path: str, *args, **kwargs) -> None:
    import cv2

    img = show_learning(*args, **kwargs)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, img[..., ::-1])  # RGB → BGR


def _depth_to_rgb(depth: np.ndarray) -> np.ndarray:
    """Min-max normalize to uint8 grayscale RGB (the reference's per-frame
    processing, ``datasets/MVSEC/utils.py:100-106``).

    The scale is computed over VALID pixels only (nanmin/nanmax): zeroing
    NaNs first would pin lo to 0 whenever a frame has any invalid pixel and
    crush the real depth range (typically all > 1 m) into the upper band.
    Invalid pixels render as black after normalization."""
    f = np.asarray(depth, np.float32).squeeze()
    valid = np.isfinite(f)
    if not valid.any():
        z = np.zeros(f.shape, np.uint8)
        return np.stack([z, z, z], axis=-1)
    lo, hi = float(np.nanmin(f)), float(np.nanmax(f))
    g = (f - lo) * (255.0 / (hi - lo)) if hi > lo else np.zeros_like(f)
    g = np.where(valid, g, 0.0).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def _write_video(frames, out_path: str, fps: int) -> None:
    """Shared mp4 writer: RGB frames in, BGR mp4v file out."""
    import cv2

    frames = list(frames)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        raise IOError(f"could not open video writer for '{out_path}'")
    for f in frames:
        writer.write(f[..., ::-1])
    writer.release()


def depth_video(depths: Sequence[np.ndarray], out_path: str,
                fps: int = 20) -> None:
    """Depth-map sequence → mp4 (single-stream form of the reference's
    ``mvsecShowDepth``, ``datasets/MVSEC/utils.py:76-112`` — headless:
    writes the file instead of an imshow loop). For the reference's full
    L/R/raw/blended mosaic use :func:`depth_mosaic_video`."""
    _write_video((_depth_to_rgb(d) for d in depths), out_path, fps)


def _to_rgb_row(left: np.ndarray, right: np.ndarray, blended: bool) -> np.ndarray:
    """One L|R mosaic row; blended frames are the dataset's own uint8 RGB
    previews, depth frames go through the valid-pixel normalizer."""
    if blended:
        l3 = np.asarray(left, np.uint8)
        r3 = np.asarray(right, np.uint8)
        if l3.ndim == 2:
            l3 = np.stack([l3] * 3, axis=-1)
            r3 = np.stack([r3] * 3, axis=-1)
    else:
        l3, r3 = _depth_to_rgb(left), _depth_to_rgb(right)
    return np.concatenate([l3, r3], axis=1)


def blended_video(left_blended: Sequence[np.ndarray],
                  right_blended: Sequence[np.ndarray],
                  out_path: str, fps: int = 20) -> None:
    """Side-by-side L|R video of the dataset's events-on-depth preview
    images (reference ``mvsecShowBlended``, ``datasets/MVSEC/utils.py:
    114-133`` — headless file output)."""
    _write_video((_to_rgb_row(l, r, blended=True)
                  for l, r in zip(left_blended, right_blended)),
                 out_path, fps)


def depth_mosaic_video(
    rect_left: Sequence[np.ndarray], rect_right: Sequence[np.ndarray],
    raw_left: Sequence[np.ndarray], raw_right: Sequence[np.ndarray],
    blended_left: Sequence[np.ndarray], blended_right: Sequence[np.ndarray],
    out_path: str, fps: int = 20,
) -> None:
    """The reference's full 3×2 dataset mosaic (``mvsecShowDepth``,
    ``datasets/MVSEC/utils.py:76-112``): rectified L|R on top, raw L|R in
    the middle, the dataset's blended previews at the bottom — headless
    mp4 instead of the imshow loop."""
    def frames():
        for fr in zip(rect_left, rect_right, raw_left, raw_right,
                      blended_left, blended_right):
            rows = [_to_rgb_row(fr[0], fr[1], blended=False),
                    _to_rgb_row(fr[2], fr[3], blended=False),
                    _to_rgb_row(fr[4], fr[5], blended=True)]
            yield np.concatenate(rows, axis=0)

    _write_video(frames(), out_path, fps)


def events_on_depth_frames(
    depths: np.ndarray,
    depth_ts: np.ndarray,
    events: np.ndarray,
) -> list:
    """Superpose raw events on depth frames → list of RGB arrays
    (reference ``mvsecSpikesAndDepth``, ``datasets/MVSEC/utils.py:137-213``).

    ``events``: [N, 4] XYTP (the repo's canonical AER column order); the
    reference's per-event Python painting loop becomes one vectorized
    searchsorted binning + fancy-index paint per frame. Events with
    ``t <= depth_ts[i]`` since the previous acquisition land on frame i
    (the reference assigns events to the *next* Lidar acquisition).
    """
    depths = np.asarray(depths)
    ev = np.asarray(events)
    x = ev[:, 0].astype(np.int64)
    y = ev[:, 1].astype(np.int64)
    t = ev[:, 2].astype(np.float64)
    pol = ev[:, 3]
    h, w = depths.shape[1], depths.shape[2]
    keep = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    x, y, t, pol = x[keep], y[keep], t[keep], pol[keep]
    frame_idx = np.searchsorted(np.asarray(depth_ts, np.float64), t,
                                side="left")
    out = []
    for i in range(depths.shape[0]):
        rgb = _depth_to_rgb(depths[i])
        sel = frame_idx == i
        on = sel & (pol > 0)
        off = sel & ~(pol > 0)
        rgb[y[on], x[on]] = (255, 0, 0)   # ON = red
        rgb[y[off], x[off]] = (0, 0, 255)  # OFF = blue
        out.append(rgb)
    return out


def events_on_depth_video(
    depths: np.ndarray,
    depth_ts: np.ndarray,
    events: np.ndarray,
    out_path: str,
    fps: int = 20,
) -> None:
    """mp4 of :func:`events_on_depth_frames` (headless ``mvsecSpikesAndDepth``)."""
    _write_video(events_on_depth_frames(depths, depth_ts, events),
                 out_path, fps)


def event_frames_video(frames: np.ndarray, out_path: str,
                       fps: int = 30) -> None:
    """Event-count frame sequence [N, H, W, 2] → color mp4 (the DENSE
    dataset preview, reference ``dense_dataset.py:182-188`` ``DENSE.show`` —
    headless file output; colors per ``event_frame_to_rgb``)."""
    _write_video((event_frame_to_rgb(f[..., :2]) for f in np.asarray(frames)),
                 out_path, fps)


def make_video(png_paths: Sequence[str], out_path: str, fps: int = 20) -> None:
    """Assemble PNG frames into an mp4 (reference make_vid_from_pngs,
    viz.py:97-122; default fps = LIDAR rate)."""
    import cv2

    if not png_paths:
        raise ValueError("no frames given")
    first = cv2.imread(png_paths[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for p in png_paths:
        frame = cv2.imread(p)
        if frame.shape[:2] != (h, w):
            frame = cv2.resize(frame, (w, h))
        writer.write(frame)
    writer.release()
