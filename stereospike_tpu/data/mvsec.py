"""MVSEC dataset: hdf5 loading, preprocessing, Tulyakov splits, batching.

Rebuild of the reference pipeline (``datasets/MVSEC/mvsec_dataset.py`` +
``indices.py``) with the hot loops replaced by the device voxelizer
(``data/voxelizer.py``) / native host ops (``native/``):

per sequence (``MVSEC_sequence.__init__``, mvsec_dataset.py:106-207):
  1. read ``<seq>_data.hdf5`` (L/R events) + ``<seq>_gt.hdf5`` (left
     rectified depth + timestamps)
  2. crop take-off/landing frames via the per-split frame ranges
     (indices.py:4-19 → ``mvsec_splits.json``)
  3. fill GT holes with grayscale area closing, threshold 24
     (mvsec_dataset.py:139-141; native C++ here)
  4. zero depth → invalid; label → LIN/LOG/DISP (mvsec_dataset.py:144-156);
     invalid pixels become a boolean mask instead of NaN
  5. time-crop events to (ts[0] − 50 ms, ts[−1]) (mvsec_dataset.py:166-167)
  6. rectify through the 4 calib maps + voxelize to
     [n_chunks, nfpdm, H, W, 2] (device scatter; utils.py:31-56,215-281)
  7. optional nonzero-normalization (mvsec_dataset.py:183-192)

splits (``load_MVSEC``, mvsec_dataset.py:14-73): split k trains on the other
two sequences and carves val (200 fixed indices) / test out of sequence k.

Sample layout (chunk indexing per mvsec_dataset.py:212-242): each index
yields N_warmup warmup chunks, N_train train chunks, the GT of the last
train chunk, and the GT preceding the warmup window as ``init_pots``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from stereospike_tpu.data.voxelizer import FRAME_H, FRAME_W, voxelize_sequence
from stereospike_tpu.native import area_closing

_SPLITS_PATH = os.path.join(os.path.dirname(__file__), "mvsec_splits.json")


def load_split_tables() -> Dict:
    with open(_SPLITS_PATH) as f:
        return json.load(f)


def _np_lin_to_log(depth: np.ndarray, Dmax=10.0, alpha=6.0) -> np.ndarray:
    d = np.clip(depth, 1e-30, Dmax) / Dmax
    return np.clip(1.0 + np.log(d) / alpha, 0.0, 1.0)


def _np_depth_to_disparity(depth: np.ndarray) -> np.ndarray:
    return 7.0 * 19.941772 / (depth + 1e-15)


def _pack_frames(d: np.ndarray) -> np.ndarray:
    """Event-count frames as uint8. Counts per (pixel, polarity, 50/nfpdm ms)
    bin are tiny, so byte storage is exact while cutting host RAM and the
    per-step H2D upload 4× vs float32 (the train/eval steps cast to the
    compute dtype on device, steps.py::_loss_and_metrics). A cell needing
    >255 counts (a >5 kHz single-pixel single-polarity burst) would require
    pathological input; guarded by clip + warning rather than assumed."""
    d = np.asarray(d)
    hi = float(d.max()) if d.size else 0.0
    if hi > 255.0:
        import warnings

        warnings.warn(f"event-count frame saturates uint8 (max count {hi:.0f}"
                      "); clipping — pass pack_uint8=False for exact floats")
        d = np.minimum(d, 255.0)
    return d.astype(np.uint8)


@dataclasses.dataclass
class MvsecSequence:
    """One preprocessed indoor_flying sequence.

    Arrays (channel-last):
      data_left/right: [n_chunks, nfpdm, H, W, 2] float32 spike counts
      labels:          [n_chunks, H, W, 1] float32 (learned metric)
      masks:           [n_chunks, H, W, 1] bool
    plus the reference's warmup bookkeeping split into ``first_*`` vs main
    arrays (mvsec_dataset.py:196-204).
    """

    data_left: np.ndarray
    data_right: np.ndarray
    labels: np.ndarray
    masks: np.ndarray
    n_warmup: int
    n_train: int

    # views emulating mvsec_dataset.py:197-204
    @property
    def _nfirst(self) -> int:
        return 1 + 2 * (self.n_warmup + self.n_train)

    def __len__(self) -> int:
        return self.labels.shape[0] - (self.n_warmup + self.n_train)

    def sample(self, index: int) -> Dict[str, np.ndarray]:
        """Emit one training sample (mvsec_dataset.py:212-242)."""
        nw, nt = self.n_warmup, self.n_train
        off = nw + nt  # main arrays start at chunk nw+nt
        if index - nt - nw - 1 >= 0:
            base = off + index  # absolute chunk index of the sample's last chunk
            init = base - nt - nw
            warm = slice(base - nt - nw + 1, base - nt + 1)
            train = slice(base - nt + 1, base + 1)
            gt_idx = base
        else:
            init = index
            warm = slice(index + 1, index + 1 + nw)
            train = slice(index + 1 + nw, index + 1 + nw + nt)
            gt_idx = index + nw + nt
        return {
            "init_pots": self.labels[init],
            "init_mask": self.masks[init],
            "warmup_left": self.data_left[warm],
            "warmup_right": self.data_right[warm],
            "chunks_left": self.data_left[train],
            "chunks_right": self.data_right[train],
            "gt": self.labels[gt_idx],
            "mask": self.masks[gt_idx],
        }


def _first_row_with_t_above(dset, val: float, strict: bool = True) -> int:
    """Binary search a time-sorted [N, 4] hdf5 events dataset: the first
    row index whose timestamp is > ``val`` (``strict``) or >= ``val``.
    O(log N) single-row point reads — no table materialization."""
    lo, hi = 0, dset.shape[0]
    while lo < hi:
        mid = (lo + hi) // 2
        t = float(dset[mid, 2])
        if t < val or (strict and t == val):
            lo = mid + 1
        else:
            hi = mid
    return lo


def load_sequence(
    root: str,
    scenario: str,
    split: str,
    sequence: str,
    *,
    nfpdm: int = 1,
    warmup_chunks: int = 1,
    train_chunks: int = 1,
    learn_on: str = "LIN",
    normalize: bool = False,
    area_threshold: int = 24,
    tables: Optional[Dict] = None,
    hw: Tuple[int, int] = (FRAME_H, FRAME_W),
    device_voxelize: bool = False,
    event_block_rows: Optional[int] = None,
    pack_uint8: bool = True,
) -> MvsecSequence:
    """Load + preprocess one MVSEC sequence from the on-disk hdf5 layout
    (``<root>/<scenario>/<scenario><seq>_{data,gt}.hdf5`` +
    ``<scenario>_calib/*_{x,y}_map.txt``). ``tables`` overrides the packaged
    split tables (used by the synthetic fixtures)."""
    import h5py

    if normalize and pack_uint8:
        import warnings

        warnings.warn(
            "normalize=True keeps count frames float32 — the pack_uint8 "
            "4x host-RAM/H2D saving does not apply to normalized frames",
            stacklevel=2)
    tables = load_split_tables() if tables is None else tables
    seq_name = f"{scenario}{sequence}"
    start, end = tables["frame_ranges"][scenario][f"split{split}"][seq_name]

    gt_path = os.path.join(root, scenario, f"{seq_name}_gt.hdf5")
    data_path = os.path.join(root, scenario, f"{seq_name}_data.hdf5")
    with h5py.File(gt_path, "r") as f:
        depth = np.asarray(f["davis"]["left"]["depth_image_rect"], np.float32)
        depth_ts = np.asarray(f["davis"]["left"]["depth_image_rect_ts"], np.float64)
    depth, depth_ts = depth[start:end], depth_ts[start:end]

    # hole filling + validity mask (zeros/NaN are invalid)
    for i in range(depth.shape[0]):
        frame = np.nan_to_num(depth[i], nan=0.0)
        depth[i] = area_closing(frame, area_threshold)
    masks = depth > 0

    labels = depth.copy()
    if learn_on == "LOG":
        labels = _np_lin_to_log(labels)
    elif learn_on == "DISP":
        labels = _np_depth_to_disparity(labels)
    elif learn_on != "LIN":
        raise ValueError("learn_on must be LIN, LOG or DISP")
    labels = np.where(masks, labels, 0.0).astype(np.float32)

    calib = os.path.join(root, scenario, f"{scenario}_calib")
    maps = {
        side: (
            np.loadtxt(os.path.join(calib, f"{scenario}_{side}_x_map.txt")),
            np.loadtxt(os.path.join(calib, f"{scenario}_{side}_y_map.txt")),
        )
        for side in ("left", "right")
    }
    # time-crop to the retained GT window (mvsec_dataset.py:166-167)
    t_lo, t_hi = depth_ts[0] - 0.05, depth_ts[-1]
    n_chunks = depth_ts.shape[0]

    if event_block_rows:
        # memory-bounded build: a real MVSEC sequence carries O(10^8)
        # events (~GBs at float64); instead of materializing the table,
        # binary-search the crop bounds on the time-sorted hdf5 column,
        # then stream fixed-size row blocks straight into the C++
        # rectify+bin accumulator (binning is a pure scatter-add, so
        # per-block accumulation into one frames buffer is exact). Peak
        # event memory = event_block_rows rows, regardless of file size.
        if device_voxelize:
            raise ValueError(
                "event_block_rows streams through the host binner; "
                "device_voxelize needs the full table (unset one)")
        from stereospike_tpu.native import rectify_bin_events

        dt = 1.0 / (20.0 * nfpdm)
        shape = (n_chunks, nfpdm, hw[0], hw[1], 2)
        with h5py.File(data_path, "r") as f:
            out = {}
            for side in ("left", "right"):
                dset = f["davis"][side]["events"]
                i0 = _first_row_with_t_above(dset, t_lo)
                i1 = _first_row_with_t_above(dset, t_hi, strict=False)
                frames = np.zeros((n_chunks * nfpdm, hw[0], hw[1], 2),
                                  np.float32)
                t0 = float(dset[i0, 2]) if i1 > i0 else 0.0
                for s in range(i0, i1, int(event_block_rows)):
                    blk = np.asarray(
                        dset[s:min(s + int(event_block_rows), i1)],
                        np.float64)
                    rectify_bin_events(
                        blk, n_chunks * nfpdm, t0, dt,
                        x_map=maps[side][0], y_map=maps[side][1],
                        height=hw[0], width=hw[1], out=frames)
                out[side] = frames.reshape(shape)
        data_l, data_r = out["left"], out["right"]
        if normalize:  # nonzero-normalization (mvsec_dataset.py:183-192)
            for d in (data_l, data_r):
                nz = d > 0
                m, s = d[nz].mean(), d[nz].std()
                d[nz] = (d[nz] - m) / s
        elif pack_uint8:
            data_l, data_r = _pack_frames(data_l), _pack_frames(data_r)
        return MvsecSequence(
            data_left=data_l, data_right=data_r,
            labels=labels[..., None], masks=masks[..., None],
            n_warmup=warmup_chunks, n_train=train_chunks,
        )

    with h5py.File(data_path, "r") as f:
        # Keep events in float64: real MVSEC timestamps are ROS epoch seconds
        # (~1.5e9), where float32 resolution is ~128 s — narrowing before the
        # offset is removed would destroy the time-crop and the 50 ms binning.
        # The voxelizer/native binners subtract the first-event offset at full
        # precision and only then narrow to float32.
        ev_l = np.asarray(f["davis"]["left"]["events"], np.float64)
        ev_r = np.asarray(f["davis"]["right"]["events"], np.float64)

    ev_l = ev_l[(ev_l[:, 2] > t_lo) & (ev_l[:, 2] < t_hi)]
    ev_r = ev_r[(ev_r[:, 2] > t_lo) & (ev_r[:, 2] < t_hi)]

    if device_voxelize:
        data_l = voxelize_sequence(ev_l, n_chunks, nfpdm,
                                   x_map=maps["left"][0], y_map=maps["left"][1],
                                   height=hw[0], width=hw[1])
        data_r = voxelize_sequence(ev_r, n_chunks, nfpdm,
                                   x_map=maps["right"][0], y_map=maps["right"][1],
                                   height=hw[0], width=hw[1])
    else:
        # native C++ single-pass rectify+bin: the build-time voxelization is
        # host-bound streaming work; keep the accelerator for training. Both
        # paths produce identical tensors (tested).
        from stereospike_tpu.native import rectify_bin_events

        dt = 1.0 / (20.0 * nfpdm)
        shape = (n_chunks, nfpdm, hw[0], hw[1], 2)
        data_l = rectify_bin_events(
            ev_l, n_chunks * nfpdm, float(ev_l[0, 2]), dt,
            x_map=maps["left"][0], y_map=maps["left"][1],
            height=hw[0], width=hw[1]).reshape(shape)
        data_r = rectify_bin_events(
            ev_r, n_chunks * nfpdm, float(ev_r[0, 2]), dt,
            x_map=maps["right"][0], y_map=maps["right"][1],
            height=hw[0], width=hw[1]).reshape(shape)

    data_l, data_r = np.asarray(data_l), np.asarray(data_r)
    if normalize:  # nonzero-normalization (mvsec_dataset.py:183-192)
        for d in (data_l, data_r):
            nz = d > 0
            m, s = d[nz].mean(), d[nz].std()
            d[nz] = (d[nz] - m) / s
    elif pack_uint8:
        data_l, data_r = _pack_frames(data_l), _pack_frames(data_r)

    return MvsecSequence(
        data_left=data_l, data_right=data_r,
        labels=labels[..., None], masks=masks[..., None],
        n_warmup=warmup_chunks, n_train=train_chunks,
    )


@dataclasses.dataclass
class MvsecView:
    """A (sub)set of samples over one or more sequences."""

    sequences: List[MvsecSequence]
    indices: List[Tuple[int, int]]  # (sequence_id, sample_index)

    def __len__(self) -> int:
        return len(self.indices)

    def sample(self, i: int) -> Dict[str, np.ndarray]:
        seq_id, idx = self.indices[i]
        return self.sequences[seq_id].sample(idx)


def load_mvsec(
    root: str,
    scenario: str = "indoor_flying",
    split: str = "1",
    *,
    nfpdm: int = 1,
    warmup_chunks: int = 1,
    train_chunks: int = 1,
    learn_on: str = "LIN",
    normalize: bool = False,
    load_test_only: bool = False,
    tables: Optional[Dict] = None,
    hw: Tuple[int, int] = (FRAME_H, FRAME_W),
    event_block_rows: Optional[int] = None,
    pack_uint8: bool = True,
):
    """Assemble (train, val, test) views per the Tulyakov split protocol
    (load_MVSEC, mvsec_dataset.py:14-73). ``event_block_rows`` bounds the
    build's event memory (streamed hdf5 blocks through the C++ binner);
    ``pack_uint8`` stores the count frames as bytes (exact, 4× less RAM
    and H2D — see ``_pack_frames``)."""
    tables = load_split_tables() if tables is None else tables
    info = tables["splits"][split]
    kw = dict(nfpdm=nfpdm, warmup_chunks=warmup_chunks,
              train_chunks=train_chunks, learn_on=learn_on, normalize=normalize,
              tables=tables, hw=hw, event_block_rows=event_block_rows,
              pack_uint8=pack_uint8)

    valtest = load_sequence(root, scenario, split, info["valtest_sequence"], **kw)

    def _in_range(idx):
        # the published index tables assume warmup=train=1 chunk; with longer
        # windows the last few samples fall off the end of the sequence
        kept = [i for i in idx if i < len(valtest)]
        if len(kept) < len(idx):
            import warnings

            warnings.warn(f"dropped {len(idx) - len(kept)} val/test indices "
                          "beyond the sequence end (warmup/train windows "
                          "longer than the split tables assume)")
        return kept

    test = MvsecView([valtest], [(0, i) for i in _in_range(info["test_indices"])])
    if load_test_only:
        return test
    train_seqs = [
        load_sequence(root, scenario, split, s, **kw)
        for s in info["train_sequences"]
    ]
    train = MvsecView(
        train_seqs,
        [(si, i) for si, s in enumerate(train_seqs) for i in range(len(s))],
    )
    val = MvsecView([valtest], [(0, i) for i in _in_range(info["valid_indices"])])
    return train, val, test


def batches(
    view: MvsecView,
    batch_size: int,
    *,
    shuffle: bool = False,
    drop_last: bool = True,
    seed: int = 0,
    binocular: bool = True,
    include_warmup: bool = False,
    n_timesteps: int = 1,
    shard: Optional[Tuple[int, int]] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batch iterator emitting the framework's canonical training batches.

    Chunk frames are channel-stacked eye-major (train.py:200-218): each
    sample's [N_train, nfpdm, H, W, 2] chunks are spread over
    ``n_timesteps`` scan steps (must divide N_train; 1 = the reference's
    single-step layout), each step carrying
    C = eyes · (N_train/n_timesteps) · nfpdm · 2 channels ordered
    (eye, chunk, frame, polarity).

    ``shard=(rank, world)``: the multi-HOST data contract — every host
    shuffles the SAME seed-deterministic order, then takes the strided
    slice ``order[rank::world]`` and truncates to the minimum per-rank
    length, so all ranks run the same number of steps (a requirement for
    lockstep collectives) over disjoint samples. ``batch_size`` is the
    per-host batch.
    """
    order = np.arange(len(view))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if shard is not None:
        rank, world = shard
        if not 0 <= rank < world:
            raise ValueError(f"shard rank {rank} outside world {world}")
        per_rank = len(order) // world  # min length → equal step counts
        order = order[rank::world][:per_rank]

    n_train_chunks = view.sequences[0].n_train if len(view) else n_timesteps
    if n_train_chunks % n_timesteps:
        raise ValueError(f"n_timesteps={n_timesteps} must divide the "
                         f"{n_train_chunks} train chunks per sample")
    chunks_per_step = n_train_chunks // n_timesteps

    def stack_eye(chunks: np.ndarray) -> np.ndarray:
        # [N, nfpdm, H, W, 2] -> [N/npt, H, W, npt*nfpdm*2] with npt =
        # N_train/n_timesteps chunks channel-stacked per step; warmup windows
        # use the same npt so their per-step channel count matches the model's
        n, f, h, w, p = chunks.shape
        if n % chunks_per_step:
            raise ValueError(
                f"{n} chunks do not divide into steps of {chunks_per_step}")
        t = n // chunks_per_step
        return (chunks.reshape(t, chunks_per_step, f, h, w, p)
                .transpose(0, 3, 4, 1, 2, 5)
                .reshape(t, h, w, chunks_per_step * f * p))

    n = len(order)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        idx = order[s:s + batch_size]
        samples = [view.sample(int(i)) for i in idx]
        frames = []
        for smp in samples:
            eyes = [stack_eye(smp["chunks_left"])]
            if binocular:
                eyes.append(stack_eye(smp["chunks_right"]))
            frames.append(np.concatenate(eyes, axis=-1))
        batch = {
            # keep the stored frame dtype: uint8-packed builds upload 4×
            # fewer bytes; the jitted steps cast to compute dtype on device
            "chunks": np.stack(frames),
            "gt": np.stack([smp["gt"] for smp in samples]).astype(np.float32),
            "mask": np.stack([smp["mask"] for smp in samples]),
            "init_pots": np.stack(
                [smp["init_pots"] for smp in samples]).astype(np.float32),
            # init_pots' validity mask travels with it so the time-mirror
            # augmentation can swap gt<->init_pots together with mask<->init_mask
            "init_mask": np.stack([smp["init_mask"] for smp in samples]),
        }
        if include_warmup:
            warm = []
            for smp in samples:
                eyes = [stack_eye(smp["warmup_left"])]
                if binocular:
                    eyes.append(stack_eye(smp["warmup_right"]))
                warm.append(np.concatenate(eyes, axis=-1))
            batch["warmup"] = np.stack(warm)
        yield batch
