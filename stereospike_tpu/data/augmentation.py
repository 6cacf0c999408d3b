"""Jitted, PRNG-driven data augmentation on canonical batches.

Reference ``datasets/data_augmentation.py`` (per-sample torch transforms on
host tensors) re-expressed as vectorized device functions: every transform
draws an independent per-sample Bernoulli and selects between original and
transformed with ``where`` — one fused XLA program, no host RNG state.

Batch layout: ``chunks`` [B, T, H, W, C] with C channel-stacked eye-major
(eye, chunk, frame, polarity); ``gt``/``mask``/``init_pots`` [B, H, W, 1].

- horizontal/vertical flip (data_augmentation.py:33-82): flip W / H of
  chunks, gt, mask, init_pots together
- time mirror (:85-124): reverse T and the per-eye channel block (which is
  exactly reversing chunk, frame and polarity order in the stacked layout),
  swap init_pots ↔ gt
- event drop (:127-163): per-sample drop rate q ~ U[min,max], zero each
  count with prob q (the reference thresholds a uniform per count cell)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _sel(flag: Array, a: Array, b: Array) -> Array:
    return jnp.where(flag.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)


def random_horizontal_flip(key: Array, batch: Dict, p: float = 0.5) -> Dict:
    flag = jax.random.uniform(key, (batch["gt"].shape[0],)) < p
    out = dict(batch)
    out["chunks"] = _sel(flag, batch["chunks"][:, :, :, ::-1], batch["chunks"])
    for k in ("gt", "mask", "init_pots", "init_mask"):
        if k in batch:
            out[k] = _sel(flag, batch[k][:, :, ::-1], batch[k])
    if "warmup" in batch:
        out["warmup"] = _sel(flag, batch["warmup"][:, :, :, ::-1], batch["warmup"])
    return out


def random_vertical_flip(key: Array, batch: Dict, p: float = 0.5) -> Dict:
    flag = jax.random.uniform(key, (batch["gt"].shape[0],)) < p
    out = dict(batch)
    out["chunks"] = _sel(flag, batch["chunks"][:, :, ::-1], batch["chunks"])
    for k in ("gt", "mask", "init_pots", "init_mask"):
        if k in batch:
            out[k] = _sel(flag, batch[k][:, ::-1], batch[k])
    if "warmup" in batch:
        out["warmup"] = _sel(flag, batch["warmup"][:, :, ::-1], batch["warmup"])
    return out


def _mirror_channels(x: Array, eyes: int) -> Array:
    """Reverse T and, within each eye block, the stacked (chunk, frame,
    polarity) channel order."""
    b, t, h, w, c = x.shape
    per_eye = c // eyes
    x = x[:, ::-1]  # reverse scan-time axis
    x = x.reshape(b, t, h, w, eyes, per_eye)[..., ::-1]
    return x.reshape(b, t, h, w, c)


def random_time_mirror(key: Array, batch: Dict, p: float = 0.5,
                       eyes: int = 2, flag: Optional[Array] = None) -> Dict:
    """``flag`` (precomputed per-sample mirror decisions) replaces the
    internal Bernoulli draw — the host-side-swap input path draws the SAME
    flags up front (:func:`time_mirror_flags`), applies the gt<->init_pots
    swap on host before upload, and passes the flags here so only the
    chunk/warmup mirroring runs on device."""
    if flag is None:
        flag = jax.random.uniform(key, (batch["gt"].shape[0],)) < p
    out = dict(batch)
    if "warmup" in batch:
        # chronological order is [warmup | chunks]; mirroring reverses the
        # concatenation then re-splits (data_augmentation.py:103-112)
        t_w = batch["warmup"].shape[1]
        joint = jnp.concatenate([batch["warmup"], batch["chunks"]], axis=1)
        mirrored = _mirror_channels(joint, eyes)
        out["warmup"] = _sel(flag, mirrored[:, :t_w], batch["warmup"])
        out["chunks"] = _sel(flag, mirrored[:, t_w:], batch["chunks"])
    else:
        out["chunks"] = _sel(flag, _mirror_channels(batch["chunks"], eyes),
                             batch["chunks"])
    if "init_pots" in batch:
        # gt and init_pots swap, so their validity masks MUST swap with them
        # — a mirrored sample scored against the pre-swap mask trains on
        # invalid (zero-depth) pixels of the new GT
        if "init_mask" not in batch:
            raise ValueError(
                "time-mirror swaps gt<->init_pots and must swap their masks: "
                "batches carrying init_pots must also carry init_mask")
        out["init_pots"] = _sel(flag, batch["gt"], batch["init_pots"])
        out["gt"] = _sel(flag, batch["init_pots"], batch["gt"])
        out["init_mask"] = _sel(flag, batch["mask"], batch["init_mask"])
        out["mask"] = _sel(flag, batch["init_mask"], batch["mask"])
    return out


def random_event_drop(key: Array, batch: Dict, p: float = 0.5,
                      min_drop_rate: float = 0.0,
                      max_drop_rate: float = 0.4) -> Dict:
    k_apply, k_q, k_mask, k_warm = jax.random.split(key, 4)
    b = batch["gt"].shape[0]
    flag = jax.random.uniform(k_apply, (b,)) < p
    q = jax.random.uniform(k_q, (b,), minval=min_drop_rate, maxval=max_drop_rate)
    out = dict(batch)

    def drop(k, x):
        keep = jax.random.uniform(k, x.shape) > q.reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return _sel(flag, x * keep, x)

    out["chunks"] = drop(k_mask, batch["chunks"])
    if "warmup" in batch:
        out["warmup"] = drop(k_warm, batch["warmup"])
    return out


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Defaults mirror the reference's composed pipeline
    (data_augmentation.py:166-172)."""

    hflip_p: float = 0.5
    vflip_p: float = 0.1
    time_mirror_p: float = 0.5
    event_drop_p: float = 0.6
    min_drop_rate: float = 0.0
    max_drop_rate: float = 0.4
    eyes: int = 2


def time_mirror_flags(key: Array, batch_size: int,
                      cfg: AugmentConfig = AugmentConfig()) -> Array:
    """The EXACT per-sample mirror decisions :func:`augment_batch` would
    draw from ``key`` — same key split, same uniform draw. Lets the input
    stage apply the gt<->init_pots swap on HOST and skip uploading
    init_pots/init_mask (36% of a default batch's bytes; the upload-bound
    production loop's biggest input cost, see
    benchmarks/production_loop_throughput.json), then run the rest of the
    augmentation on device via ``augment_batch(..., mirror_flag=flags)``
    bit-identically to the all-device path (the swap commutes with the
    spatial flips: they apply the same transform to gt and init_pots)."""
    k3 = jax.random.split(key, 4)[2]
    return jax.random.uniform(k3, (batch_size,)) < cfg.time_mirror_p


def augment_batch(key: Array, batch: Dict,
                  cfg: AugmentConfig = AugmentConfig(),
                  mirror_flag: Optional[Array] = None) -> Dict:
    """Compose all transforms (jit-friendly; fold into the train step).

    ``mirror_flag``: precomputed time-mirror decisions
    (:func:`time_mirror_flags`) for the host-side-swap input path; the
    flip/drop draws still come from ``key`` exactly as without it."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    batch = random_horizontal_flip(k1, batch, cfg.hflip_p)
    batch = random_vertical_flip(k2, batch, cfg.vflip_p)
    batch = random_time_mirror(k3, batch, cfg.time_mirror_p, cfg.eyes,
                               flag=mirror_flag)
    batch = random_event_drop(k4, batch, cfg.event_drop_p,
                              cfg.min_drop_rate, cfg.max_drop_rate)
    return batch
