"""Synthetic on-disk dataset fixtures in the MVSEC/DENSE file formats.

Writes tiny hdf5/npy trees with the exact schema the loaders expect, so the
full disk→device pipeline is testable without the multi-GB originals
(SURVEY.md §4: fake-dataset fixture).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np


def make_mvsec_fixture(
    root: str,
    *,
    scenario: str = "indoor_flying",
    sequences: Tuple[str, ...] = ("1", "2", "3"),
    n_depth: int = 24,
    n_events: int = 20000,
    hw: Tuple[int, int] = (260, 346),
    seed: int = 0,
    rect_jitter: float = 0.5,
    t_offset: float = 1.5061e9,
    warmup_chunks: int = 1,
    train_chunks: int = 1,
) -> Dict:
    """Write ``<root>/<scenario>/...`` hdf5 + calib maps; return mini split
    tables (usable as the ``tables=`` override of the loader)."""
    import h5py

    h, w = hw
    rng = np.random.default_rng(seed)
    scen_dir = os.path.join(root, scenario)
    calib_dir = os.path.join(scen_dir, f"{scenario}_calib")
    os.makedirs(calib_dir, exist_ok=True)

    for side in ("left", "right"):
        x_map = np.tile(np.arange(w, dtype=np.float64), (h, 1)) + \
            rng.normal(0, rect_jitter, (h, w))
        y_map = np.tile(np.arange(h, dtype=np.float64)[:, None], (1, w)) + \
            rng.normal(0, rect_jitter, (h, w))
        np.savetxt(os.path.join(calib_dir, f"{scenario}_{side}_x_map.txt"), x_map)
        np.savetxt(os.path.join(calib_dir, f"{scenario}_{side}_y_map.txt"), y_map)

    for seq in sequences:
        name = f"{scenario}{seq}"
        # 20 Hz timestamps at realistic ROS-epoch magnitude (~1.5e9 s): real
        # MVSEC stamps are epoch seconds, which float32 cannot represent at
        # sub-second resolution — the loaders must handle the offset removal
        # in float64, and the fixture must exercise that
        ts = t_offset + np.arange(n_depth) / 20.0
        depth = rng.uniform(1.0, 6.0, (n_depth, h, w)).astype(np.float32)
        # punch small holes (zeros) + some NaNs, as in the real GT
        holes = rng.random((n_depth, h, w)) < 0.02
        depth[holes] = 0.0
        depth[rng.random((n_depth, h, w)) < 0.01] = np.nan

        with h5py.File(os.path.join(scen_dir, f"{name}_gt.hdf5"), "w") as f:
            g = f.create_group("davis").create_group("left")
            g.create_dataset("depth_image_rect", data=depth)
            g.create_dataset("depth_image_rect_ts", data=ts)

        with h5py.File(os.path.join(scen_dir, f"{name}_data.hdf5"), "w") as f:
            g = f.create_group("davis")
            for side in ("left", "right"):
                ev_t = np.sort(rng.uniform(ts[0] - 0.3, ts[-1] + 0.1, n_events))
                ev = np.stack([
                    rng.integers(0, w, n_events).astype(np.float64),
                    rng.integers(0, h, n_events).astype(np.float64),
                    ev_t,
                    rng.choice([0.0, 1.0], n_events),
                ], axis=1)
                g.create_group(side).create_dataset("events", data=ev)

    n_samples = n_depth - (warmup_chunks + train_chunks)
    tables = {
        "frame_ranges": {scenario: {
            f"split{s}": {f"{scenario}{q}": [0, n_depth] for q in sequences}
            for s in ("1", "2", "3")
        }},
        "splits": {
            "1": {"train_sequences": ["2", "3"], "valtest_sequence": "1",
                  "valid_indices": list(range(0, n_samples, 3)),
                  "test_indices": list(range(1, n_samples, 3))},
        },
    }
    with open(os.path.join(root, "mini_splits.json"), "w") as f:
        json.dump(tables, f)
    return tables


def make_dense_fixture(
    root: str,
    *,
    n_maps: int = 6,
    n_events: int = 3000,
    hw: Tuple[int, int] = (260, 346),
    fps: int = 30,
    seed: int = 0,
) -> None:
    """Write a DENSE-format tree: per-window .npy AER (TXYP, signed
    polarity) + per-window depth .npy (dense_dataset.py:100-131)."""
    h, w = hw
    rng = np.random.default_rng(seed)
    ev_dir = os.path.join(root, "events", "data")
    d_dir = os.path.join(root, "depth", "data")
    os.makedirs(ev_dir, exist_ok=True)
    os.makedirs(d_dir, exist_ok=True)
    for i in range(n_maps):
        t0 = i / fps
        t = np.sort(rng.uniform(t0, t0 + 1.0 / fps, n_events))
        aer = np.stack([
            t,
            rng.integers(0, w, n_events).astype(np.float64),
            rng.integers(0, h, n_events).astype(np.float64),
            rng.choice([-1.0, 1.0], n_events),
        ], axis=1)
        np.save(os.path.join(ev_dir, f"events_{i:06d}.npy"), aer)
        np.save(os.path.join(d_dir, f"depth_{i:06d}.npy"),
                rng.uniform(1.0, 9.0, (h, w)).astype(np.float32))
