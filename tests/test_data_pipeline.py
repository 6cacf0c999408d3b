"""Disk→device data-pipeline tests on synthetic MVSEC/DENSE fixtures,
plus augmentation semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.data import (
    AugmentConfig,
    augment_batch,
    batches,
    dense_batches,
    load_dense,
    load_mvsec,
    load_sequence,
    load_split_tables,
    make_dense_fixture,
    make_mvsec_fixture,
    synthetic_batch,
)

HW = (64, 80)  # small fixture resolution for speed


@pytest.fixture(scope="module")
def mvsec_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mvsec"))
    tables = make_mvsec_fixture(root, hw=HW, n_depth=12, n_events=8000)
    return root, tables


@pytest.fixture(scope="module")
def dense_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dense"))
    make_dense_fixture(root, hw=HW, n_maps=5, n_events=2000)
    return root


def test_split_tables_shipped():
    t = load_split_tables()
    assert t["splits"]["1"]["train_sequences"] == ["2", "3"]
    assert len(t["splits"]["1"]["valid_indices"]) == 200
    assert t["frame_ranges"]["indoor_flying"]["split1"]["indoor_flying1"] == [139, 1201]
    # val/test of a split are disjoint
    for s in ("1", "2", "3"):
        v = set(t["splits"][s]["valid_indices"])
        te = set(t["splits"][s]["test_indices"])
        assert not (v & te)


def test_load_sequence_shapes_and_masks(mvsec_root):
    root, tables = mvsec_root
    seq = load_sequence(root, "indoor_flying", "1", "1", tables=tables, hw=HW)
    n = seq.labels.shape[0]
    assert seq.data_left.shape == (n, 1) + HW + (2,)
    assert seq.data_right.shape == seq.data_left.shape
    assert seq.labels.shape == (n,) + HW + (1,)
    assert seq.masks.dtype == bool
    # hole filling keeps masks mostly valid; invalid only where area >= 24
    assert seq.masks.mean() > 0.9
    assert np.all(seq.labels[~seq.masks] == 0)
    # events landed: every chunk has some counts
    assert (seq.data_left.sum(axis=(1, 2, 3, 4)) > 0).all()
    assert len(seq) == n - 2


def test_sample_chunk_indexing(mvsec_root):
    root, tables = mvsec_root
    seq = load_sequence(root, "indoor_flying", "1", "1", tables=tables, hw=HW)
    # large-index branch: gt is the chunk at absolute index off+i
    smp = seq.sample(5)
    off = seq.n_warmup + seq.n_train
    np.testing.assert_array_equal(smp["gt"], seq.labels[off + 5])
    np.testing.assert_array_equal(smp["chunks_left"][-1], seq.data_left[off + 5])
    np.testing.assert_array_equal(smp["init_pots"], seq.labels[5 + off - 2])
    # small-index branch (reference mvsec_dataset.py:223-232)
    smp0 = seq.sample(0)
    np.testing.assert_array_equal(smp0["init_pots"], seq.labels[0])
    np.testing.assert_array_equal(smp0["gt"], seq.labels[2])
    np.testing.assert_array_equal(smp0["chunks_left"][-1], seq.data_left[2])


def test_load_mvsec_split_protocol(mvsec_root):
    root, tables = mvsec_root
    train, val, test = load_mvsec(root, split="1", tables=tables, hw=HW)
    info = tables["splits"]["1"]
    assert len(val) == len(info["valid_indices"])
    assert len(test) == len(info["test_indices"])
    assert len(train) == 2 * (12 - 2)  # two training sequences
    t_only = load_mvsec(root, split="1", tables=tables, load_test_only=True, hw=HW)
    assert len(t_only) == len(test)


def test_batches_canonical_layout(mvsec_root):
    root, tables = mvsec_root
    _, val, _ = load_mvsec(root, split="1", tables=tables, hw=HW)
    batch = next(batches(val, 2, include_warmup=True))
    assert batch["chunks"].shape == (2, 1) + HW + (4,)  # 2 eyes x 1 chunk x 1 frame x 2 pol
    assert batch["warmup"].shape == (2, 1) + HW + (4,)
    assert batch["gt"].shape == (2,) + HW + (1,)
    assert batch["mask"].dtype == bool
    # channel order is eye-major: first 2 channels are left eye
    smp = val.sample(0)
    np.testing.assert_array_equal(batch["chunks"][0, 0, :, :, :2],
                                  smp["chunks_left"][0, 0])
    np.testing.assert_array_equal(batch["chunks"][0, 0, :, :, 2:],
                                  smp["chunks_right"][0, 0])


def test_uint8_frame_packing_exact_and_trains(mvsec_root):
    """pack_uint8 (the default) stores count frames as bytes: exact vs the
    float32 build, 4× smaller, and the whole train/eval/firing-rate path
    consumes it (device casts happen inside the jitted steps)."""
    from stereospike_tpu.models import (
        firing_rates_sequence,
        init_params,
        stereospike_tempo,
    )

    root, tables = mvsec_root
    _, val8, _ = load_mvsec(root, split="1", tables=tables, hw=HW)
    _, val32, _ = load_mvsec(root, split="1", tables=tables, hw=HW,
                             pack_uint8=False)
    s8, s32 = val8.sequences[0], val32.sequences[0]
    assert s8.data_left.dtype == np.uint8 and s32.data_left.dtype == np.float32
    np.testing.assert_array_equal(s8.data_left.astype(np.float32),
                                  s32.data_left)
    np.testing.assert_array_equal(s8.data_right.astype(np.float32),
                                  s32.data_right)

    batch = next(batches(val8, 2, include_warmup=True))
    assert batch["chunks"].dtype == np.uint8
    cfg = stereospike_tempo(in_hw=HW)
    params = init_params(jax.random.PRNGKey(0), cfg)
    taps = firing_rates_sequence(params, jnp.asarray(batch["chunks"]), cfg)
    assert all(np.isfinite(float(v)) for v in taps.values())

    # normalize=True needs floats: packing is skipped automatically
    _, valn, _ = load_mvsec(root, split="1", tables=tables, hw=HW,
                            normalize=True)
    assert valn.sequences[0].data_left.dtype == np.float32


def test_batches_feed_train_step(mvsec_root):
    """Disk fixture → loader → model train step end-to-end."""
    from stereospike_tpu.models import init_params, stereospike_tempo
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    root, tables = mvsec_root
    train, _, _ = load_mvsec(root, split="1", tables=tables, hw=HW)
    cfg = stereospike_tempo(in_hw=HW)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx))
    batch = next(batches(train, 2, shuffle=True, seed=0))
    batch = {k: v for k, v in batch.items() if k in ("chunks", "gt", "mask")}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_dense_loader(dense_root):
    ds = load_dense(dense_root, hw=HW, take_log=True)
    assert ds.data.shape == (5, 1) + HW + (2,)
    assert ds.labels.min() >= 0 and ds.labels.max() <= 1  # log depth in [0,1]
    mirr = load_dense(dense_root, hw=HW, mirror_time=True)
    assert len(mirr) == 10
    # mirrored second half: polarity channels swapped, order reversed
    np.testing.assert_array_equal(mirr.data[5], ds.data[4][::-1, :, :, ::-1])
    batch = next(dense_batches(ds, 2))
    assert batch["chunks"].shape == (2, 1) + HW + (2,)


def test_dense_signed_polarity(dense_root):
    ds = load_dense(dense_root, hw=HW)
    # fixture draws p in {-1, +1}: both channels must be populated
    assert ds.data[..., 0].sum() > 0 and ds.data[..., 1].sum() > 0


def test_dense_xytp_format(dense_root, tmp_path):
    """XYTP column order loads identically to the same events in TXYP
    (reference AERtoEVFrame accepts both, dense_dataset.py:47-71)."""
    ref = load_dense(dense_root, hw=HW)
    root2 = str(tmp_path / "dense_xytp")
    ev_dir = os.path.join(root2, "events", "data")
    d_dir = os.path.join(root2, "depth", "data")
    os.makedirs(ev_dir)
    os.makedirs(d_dir)
    src_ev = os.path.join(dense_root, "events", "data")
    src_d = os.path.join(dense_root, "depth", "data")
    for f in os.listdir(src_ev):
        txyp = np.load(os.path.join(src_ev, f))
        np.save(os.path.join(ev_dir, f), txyp[:, [1, 2, 0, 3]])  # → XYTP
    for f in os.listdir(src_d):
        np.save(os.path.join(d_dir, f), np.load(os.path.join(src_d, f)))
    ds = load_dense(root2, hw=HW, aer_format="XYTP")
    np.testing.assert_array_equal(ds.data, ref.data)
    np.testing.assert_array_equal(ds.labels, ref.labels)
    with pytest.raises(ValueError, match="unknown AER format"):
        load_dense(root2, hw=HW, aer_format="PTXY")


# ------------------------------------------------------------- augmentation
def _aug_batch():
    b = synthetic_batch(jax.random.PRNGKey(0), batch=4, in_hw=(16, 20),
                        channels=4, T=2)
    b["init_pots"] = b["gt"] + 1.0
    b["init_mask"] = b["mask"]
    return b


def test_hflip_applies_consistently():
    b = _aug_batch()
    from stereospike_tpu.data.augmentation import random_horizontal_flip
    out = random_horizontal_flip(jax.random.PRNGKey(1), b, p=1.0)
    np.testing.assert_array_equal(np.asarray(out["chunks"]),
                                  np.asarray(b["chunks"][:, :, :, ::-1]))
    np.testing.assert_array_equal(np.asarray(out["gt"]),
                                  np.asarray(b["gt"][:, :, ::-1]))
    out0 = random_horizontal_flip(jax.random.PRNGKey(1), b, p=0.0)
    np.testing.assert_array_equal(np.asarray(out0["chunks"]),
                                  np.asarray(b["chunks"]))


def test_time_mirror_swaps_and_reverses():
    from stereospike_tpu.data.augmentation import random_time_mirror
    b = _aug_batch()
    out = random_time_mirror(jax.random.PRNGKey(2), b, p=1.0, eyes=2)
    np.testing.assert_array_equal(np.asarray(out["gt"]), np.asarray(b["init_pots"]))
    np.testing.assert_array_equal(np.asarray(out["init_pots"]), np.asarray(b["gt"]))
    # T reversed and per-eye channel blocks reversed
    expect = np.asarray(b["chunks"])[:, ::-1].reshape(4, 2, 16, 20, 2, 2)[..., ::-1]
    np.testing.assert_array_equal(np.asarray(out["chunks"]),
                                  expect.reshape(4, 2, 16, 20, 4))
    # involution: applying twice restores the original
    out2 = random_time_mirror(jax.random.PRNGKey(3), out, p=1.0, eyes=2)
    np.testing.assert_array_equal(np.asarray(out2["chunks"]), np.asarray(b["chunks"]))


def test_event_drop_reduces_counts():
    from stereospike_tpu.data.augmentation import random_event_drop
    b = _aug_batch()
    out = random_event_drop(jax.random.PRNGKey(4), b, p=1.0,
                            min_drop_rate=0.3, max_drop_rate=0.3)
    total0 = float(jnp.sum(b["chunks"]))
    total1 = float(jnp.sum(out["chunks"]))
    assert total1 < total0
    # surviving counts unchanged (zeroed, not scaled)
    ch0, ch1 = np.asarray(b["chunks"]), np.asarray(out["chunks"])
    nz = ch1 != 0
    np.testing.assert_array_equal(ch1[nz], ch0[nz])


def test_augment_batch_jits():
    b = _aug_batch()
    f = jax.jit(lambda k, b: augment_batch(k, b, AugmentConfig()))
    out = f(jax.random.PRNGKey(5), b)
    assert out["chunks"].shape == b["chunks"].shape


def test_host_mirror_swap_path_bit_identical():
    """The production input path's host-side time-mirror swap
    (train/loop._upload_augmented): drawing the mirror flags up front
    (time_mirror_flags), swapping gt<->init_pots / mask<->init_mask on
    HOST, and device-augmenting WITHOUT init keys must reproduce the
    all-device augment_batch output bit for bit (the swap commutes with
    the spatial flips — they transform gt and init_pots identically)."""
    from stereospike_tpu.data.augmentation import time_mirror_flags

    cfg = AugmentConfig(eyes=2)
    b = _aug_batch()
    key = jax.random.PRNGKey(11)

    ref = augment_batch(key, b, cfg)

    fl = np.asarray(time_mirror_flags(key, b["gt"].shape[0], cfg))
    assert fl.any() and not fl.all()  # both branches exercised
    f = fl.reshape((-1, 1, 1, 1))
    host = {"chunks": b["chunks"],
            "gt": jnp.asarray(np.where(f, np.asarray(b["init_pots"]),
                                       np.asarray(b["gt"]))),
            "mask": jnp.asarray(np.where(f, np.asarray(b["init_mask"]),
                                         np.asarray(b["mask"])))}
    got = augment_batch(key, host, cfg, mirror_flag=jnp.asarray(fl))

    for k in ("chunks", "gt", "mask"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_batches_time_axis(mvsec_root):
    """n_timesteps > 1 spreads a sample's chunks over the scan-time axis:
    step t carries chunk t's frames, channel order (eye, chunk, frame, pol)
    preserved within each step."""
    root, tables = mvsec_root
    _, val, _ = load_mvsec(root, split="1", tables=tables, hw=HW,
                           train_chunks=2, warmup_chunks=2)
    batch = next(batches(val, 2, n_timesteps=2, include_warmup=True))
    assert batch["chunks"].shape == (2, 2) + HW + (4,)  # T=2, C=eyes*1*1*2
    assert batch["warmup"].shape == (2, 2) + HW + (4,)
    smp = val.sample(0)
    # timestep t, left eye == chunk t of the left stream
    for t in range(2):
        np.testing.assert_array_equal(batch["chunks"][0, t, :, :, :2],
                                      smp["chunks_left"][t, 0])
        np.testing.assert_array_equal(batch["chunks"][0, t, :, :, 2:],
                                      smp["chunks_right"][t, 0])
    # channel-stacked layout (n_timesteps=1) is the same data reordered
    flat = next(batches(val, 2, n_timesteps=1))
    assert flat["chunks"].shape == (2, 1) + HW + (8,)
    np.testing.assert_array_equal(flat["chunks"][0, 0, :, :, :2],
                                  batch["chunks"][0, 0, :, :, :2])


def test_time_mirror_requires_init_mask():
    from stereospike_tpu.data.augmentation import random_time_mirror
    b = _aug_batch()
    del b["init_mask"]
    with pytest.raises(ValueError, match="init_mask"):
        random_time_mirror(jax.random.PRNGKey(0), b, p=1.0, eyes=2)


def test_batches_emit_init_mask_and_mirror_swaps_it(mvsec_root):
    """A force-mirrored loader batch must carry the swapped validity mask
    (the mask belongs to the GT, and the GT becomes init_pots)."""
    from stereospike_tpu.data.augmentation import random_time_mirror

    root, tables = mvsec_root
    _, val, _ = load_mvsec(root, split="1", tables=tables, hw=HW)
    batch = next(batches(val, 2))
    assert "init_mask" in batch and batch["init_mask"].dtype == bool
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out = random_time_mirror(jax.random.PRNGKey(0), jb, p=1.0, eyes=2)
    np.testing.assert_array_equal(np.asarray(out["gt"]), batch["init_pots"])
    np.testing.assert_array_equal(np.asarray(out["mask"]), batch["init_mask"])
    np.testing.assert_array_equal(np.asarray(out["init_mask"]), batch["mask"])


def test_published_hdf5_schema(tmp_path):
    """Loader conformance against the *published* MVSEC hdf5 layout
    (davis/{left,right}/events [N,4] float64 epoch-seconds;
    davis/left/depth_image_rect [T,H,W] float32 with NaN holes;
    depth_image_rect_ts [T] float64; calib maps via np.loadtxt) —
    written here with raw h5py, independent of our fixture generator
    (reference reader: mvsec_dataset.py:123-135, utils.py:13-29)."""
    import h5py

    h, w, T = 40, 52, 8
    root = str(tmp_path)
    scen = os.path.join(root, "indoor_flying")
    calib = os.path.join(scen, "indoor_flying_calib")
    os.makedirs(calib)
    rng = np.random.default_rng(3)
    for side in ("left", "right"):
        np.savetxt(os.path.join(calib, f"indoor_flying_{side}_x_map.txt"),
                   np.tile(np.arange(w, dtype=np.float64), (h, 1)))
        np.savetxt(os.path.join(calib, f"indoor_flying_{side}_y_map.txt"),
                   np.tile(np.arange(h, dtype=np.float64)[:, None], (1, w)))
    ts = 1.504645e9 + np.arange(T) / 20.0  # epoch seconds, 20 Hz
    depth = rng.uniform(1, 8, (T, h, w)).astype(np.float32)
    depth[0, :6, :6] = np.nan  # real GT carries NaN holes (36 px ≥ the
    # area-closing threshold 24, so this one must stay invalid)
    with h5py.File(os.path.join(scen, "indoor_flying1_gt.hdf5"), "w") as f:
        g = f.create_group("davis").create_group("left")
        g.create_dataset("depth_image_rect", data=depth, dtype="f4")
        g.create_dataset("depth_image_rect_ts", data=ts, dtype="f8")
    with h5py.File(os.path.join(scen, "indoor_flying1_data.hdf5"), "w") as f:
        g = f.create_group("davis")
        for side in ("left", "right"):
            n = 4000
            ev = np.stack([
                rng.integers(0, w, n).astype(np.float64),
                rng.integers(0, h, n).astype(np.float64),
                np.sort(rng.uniform(ts[0] - 0.05, ts[-1], n)),
                rng.choice([-1.0, 1.0], n),  # real polarity is ±1
            ], axis=1)
            g.create_group(side).create_dataset("events", data=ev, dtype="f8")
    tables = {"frame_ranges": {"indoor_flying":
                               {"split1": {"indoor_flying1": [0, T]}}}}
    seq = load_sequence(root, "indoor_flying", "1", "1", tables=tables,
                        hw=(h, w))
    assert seq.labels.shape == (T, h, w, 1)
    assert seq.data_left.shape == (T, 1, h, w, 2)
    assert not seq.masks[0, 0, 0, 0]          # NaN hole → invalid
    assert seq.data_left.sum() > 0 and seq.data_right.sum() > 0
    # events spread across chunks, not collapsed into bin 0 (the float32
    # epoch-timestamp failure mode)
    per_chunk = seq.data_left.sum(axis=(1, 2, 3, 4))
    assert (per_chunk[1:] > 0).any() and per_chunk.max() < seq.data_left.sum()


def test_epoch_scale_timestamps_survive_voxelization():
    """Raw float64 ROS-epoch timestamps (~1.5e9 s, float32 resolution 128 s)
    must bin identically to the same stream with relative times — both
    through the device voxelizer and the native host path."""
    from stereospike_tpu.data.voxelizer import voxelize_sequence
    from stereospike_tpu.native import rectify_bin_events

    rng = np.random.default_rng(0)
    n, n_chunks, hw = 5000, 8, (32, 40)
    t_rel = np.sort(rng.uniform(0.0, n_chunks / 20.0, n))
    ev_rel = np.stack([
        rng.integers(0, hw[1], n).astype(np.float64),
        rng.integers(0, hw[0], n).astype(np.float64),
        t_rel,
        rng.choice([0.0, 1.0], n),
    ], axis=1)
    ev_abs = ev_rel.copy()
    ev_abs[:, 2] += 1.5061e9  # ROS epoch offset

    ref = voxelize_sequence(ev_rel.astype(np.float32), n_chunks,
                            height=hw[0], width=hw[1])
    got = voxelize_sequence(ev_abs, n_chunks, height=hw[0], width=hw[1])
    np.testing.assert_array_equal(got, ref)
    # distinct, non-degenerate binning (the float32 failure collapses
    # everything into one or two frames)
    assert (got.sum(axis=(1, 2, 3, 4)) > 0).all()

    host = rectify_bin_events(ev_abs, n_chunks, float(ev_abs[0, 2]), 1 / 20.0,
                              height=hw[0], width=hw[1])
    np.testing.assert_array_equal(host.reshape(ref.shape), ref)


def test_streamed_event_loading_matches_full(mvsec_root):
    """event_block_rows (memory-bounded hdf5 streaming through the C++
    binner) must reproduce the full-table build bit-for-bit: binning is a
    pure scatter-add, so block accumulation is exact."""
    root, tables = mvsec_root
    full = load_sequence(root, "indoor_flying", "1", "1", tables=tables,
                         hw=HW)
    streamed = load_sequence(root, "indoor_flying", "1", "1", tables=tables,
                             hw=HW, event_block_rows=257)  # many odd blocks
    np.testing.assert_array_equal(streamed.data_left, full.data_left)
    np.testing.assert_array_equal(streamed.data_right, full.data_right)
    np.testing.assert_array_equal(streamed.labels, full.labels)
    np.testing.assert_array_equal(streamed.masks, full.masks)


def test_streamed_loading_rejects_device_voxelize(mvsec_root):
    root, tables = mvsec_root
    with pytest.raises(ValueError, match="event_block_rows"):
        load_sequence(root, "indoor_flying", "1", "1", tables=tables, hw=HW,
                      event_block_rows=1000, device_voxelize=True)


def test_batches_shard_partitions_disjoint_and_equal(mvsec_root):
    """Multi-host data contract: shards are disjoint, cover min-truncated
    samples, and every rank sees the SAME number of batches."""
    root, tables = mvsec_root
    train, _, _ = load_mvsec(root, split="1", tables=tables, hw=HW)
    world = 3
    seen, counts = [], []
    for rank in range(world):
        gts = []
        n = 0
        for b in batches(train, 2, shuffle=True, seed=7,
                         shard=(rank, world), drop_last=False):
            gts.append(b["gt"])
            n += b["gt"].shape[0]
        counts.append(n)
        seen.append(np.concatenate(gts) if gts else np.zeros((0,)))
    assert len(set(counts)) == 1  # equal steps per rank
    total = sum(counts)
    assert total == (len(train) // world) * world
    # disjointness: per-sample gt maps are unique in the fixture
    flat = np.concatenate([s.reshape(s.shape[0], -1) for s in seen])
    assert len(np.unique(flat.round(5), axis=0)) == total

    with pytest.raises(ValueError, match="rank"):
        next(batches(train, 2, shard=(3, 3)))


def test_learnable_fixture_carries_depth_signal(tmp_path):
    """--synthetic with synth_learnable: event-count frames must genuinely
    encode depth (density ~ 1/d^2, fixtures.py::make_mvsec_fixture) after
    the full rectify+bin pipeline, so a hardware-sized synthetic training
    run can drive MDE below the predict-the-mean floor."""
    root = str(tmp_path / "mvsec_learn")
    tables = make_mvsec_fixture(root, hw=HW, n_depth=10, n_events=100000,
                                learnable=True, seed=3)
    seq = load_sequence(root, "indoor_flying", "1", "1", tables=tables, hw=HW)
    counts = np.asarray(seq.data_left).sum(axis=(1, 4))     # [n, H, W]
    depth = np.asarray(seq.labels[..., 0])
    valid = np.asarray(seq.masks[..., 0])
    med = np.median(depth[valid])
    near = valid & (depth < med)
    far = valid & (depth >= med)
    assert counts[near].mean() > 1.5 * counts[far].mean()
    # the stereo pair is disparity-shifted, not a copy
    assert not np.array_equal(np.asarray(seq.data_left),
                              np.asarray(seq.data_right))
    # every inter-depth window produced events on both eyes
    assert (np.asarray(seq.data_left).sum(axis=(1, 2, 3, 4)) > 0).all()
    assert (np.asarray(seq.data_right).sum(axis=(1, 2, 3, 4)) > 0).all()
