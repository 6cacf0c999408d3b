#!/usr/bin/env python
"""End-to-end throughput of the PRODUCTION training loop vs the
device-resident bench number.

``bench.py`` measures a device-resident synthetic batch through the jitted
train step: no disk, no host assembly, no H2D upload, no augmentation
key-split, no epoch machinery. The production ``train_loop``
(train/loop.py) pays all of those, and round 3's real-chip synthetic run
showed a >10x gap (benchmarks/synthetic_e2e/training_logs.txt: ~30-40 f/s
through the CLI vs 720 f/s device-resident). Round 4 added a staged input
pipeline (``_Prefetcher``: batch N+1's host assembly + H2D upload ride
under step N's async-dispatched device execution — the TPU analog of the
reference's DataLoader workers + ``pin_memory=True``, train.py:100).

Round 4 also moved the time-mirror swap to the HOST
(``train/loop._upload_augmented`` + ``data/augmentation.time_mirror_flags``):
init_pots/init_mask — 36% of a default batch's bytes, consumed only by
that swap — no longer upload at all, bit-identically to the all-device
augmentation (tests/test_data_pipeline.py::
test_host_mirror_swap_path_bit_identical).

This benchmark drives the FULL production ``train_loop`` — fixture hdf5 on
disk, B=128, augmentation on, JSONL/text logging, checkpointing, per-epoch
validation — and decomposes the remaining gap:

  * device_resident_fps      — bench.py's measure() in this same process
  * production_fps[...]      — train_loop wall-clock f/s per train epoch
                               (excl. validation), prefetch {2, 0} x dtype
                               {bfloat16, float32}
  * prep_ms_per_batch        — host assembly + H2D + augment dispatch,
                               timed synchronously over one epoch's batches
  * h2d_ms / h2d_mbps        — upload leg alone (46 MB uint8 chunks +
                               58 MB gt/mask per batch through the tunnel)
  * tunnel_rtt_ms            — median scalar-fetch round trip

Round 5 adds the wire-compression leg (``TrainConfig.pack_io``, default
on — data/packing.py: fp16 gt + bit-packed mask, one jitted device unpack):
on an upload-bound link the batch bytes ARE the steady interval, so the
~35% byte cut should convert to steady f/s; the pack on/off run pair and
the packed-upload timing measure exactly that.

Writes ``benchmarks/production_loop_throughput.json``. Target
(VERDICT r3 #1): production >= 0.8x device-resident, or the decomposition
showing the remainder is this backend's tunnel RTT / upload bandwidth.
"""

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

B = int(os.environ.get("BENCH_BATCH", "128"))
N_DEPTH = int(os.environ.get("BENCH_FIXTURE_DEPTH", "514"))  # 2*(514-2)=1024
EPOCHS = int(os.environ.get("BENCH_EPOCHS", "3"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "production_loop_throughput.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_fixture():
    from stereospike_tpu.data.fixtures import make_mvsec_fixture
    from stereospike_tpu.data.mvsec import load_mvsec

    root = tempfile.mkdtemp(prefix="stereospike_prodloop_")
    log(f"building fixture n_depth={N_DEPTH} at 260x346 -> {root}")
    t0 = time.time()
    tables = make_mvsec_fixture(root, hw=(260, 346), n_depth=N_DEPTH,
                                n_events=300_000, seed=7)
    views = load_mvsec(root, split="1", tables=tables, hw=(260, 346))
    log(f"fixture + voxelize: {time.time() - t0:.1f} s; "
        f"train={len(views[0])} val={len(views[1])} samples")
    return root, views


def measure_device_resident():
    """bench.py's own measurement, same process, for apples-to-apples."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    log("device-resident step (bench.measure, bf16) ...")
    fps = bench.measure(batch=B, iters=12)
    log(f"device-resident: {fps:.1f} f/s")
    return fps


def run_production(views, *, dtype: str, prefetch: int, pack: bool = True):
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import train_loop

    ckpt = tempfile.mkdtemp(prefix=f"prodloop_{dtype}_{prefetch}_")
    cfg = TrainConfig(batch_size=B, epochs=EPOCHS, compute_dtype=dtype,
                      prefetch=prefetch, augment=True, tensorboard=False,
                      checkpoint_dir=ckpt, synth_frames=N_DEPTH,
                      pack_io=pack)
    log(f"train_loop dtype={dtype} prefetch={prefetch} pack_io={pack} "
        f"(B={B}, augment=on, {EPOCHS} epochs) ...")
    t0 = time.time()
    train_loop(cfg, data=views)
    wall = time.time() - t0
    recs = [json.loads(line)
            for line in open(os.path.join(ckpt, "training_metrics.jsonl"))]
    eps = [r for r in recs if "train_frames_per_s" in r]
    shutil.rmtree(ckpt, ignore_errors=True)
    per_epoch = [r["train_frames_per_s"] for r in eps]
    out = {
        "per_epoch_fps": per_epoch,
        # epoch 0 pays (cached) compile + first-dispatch latency; steady
        # state is the later epochs
        "steady_fps": max(per_epoch[1:]) if len(per_epoch) > 1
        else per_epoch[0],
        "val_time_s": [round(r["val_time_s"], 2) for r in eps],
        "wall_s_total": round(wall, 1),
    }
    log(f"  -> per-epoch f/s {per_epoch}, steady {out['steady_fps']}")
    return out


def measure_prep(views):
    """The input stage alone, synchronously: host batch assembly, H2D
    upload (blocked to completion), augment dispatch — what _Prefetcher
    hides under device compute."""
    from stereospike_tpu.data.augmentation import AugmentConfig, augment_batch
    from stereospike_tpu.data.mvsec import batches

    from stereospike_tpu.data.packing import (
        pack_batch_host as pack_host,
        unpack_batch_device,
    )

    aug = jax.jit(lambda k, b: augment_batch(k, b, AugmentConfig(eyes=2)))
    unpack_jit = jax.jit(unpack_batch_device)
    key = jax.random.PRNGKey(0)

    assemble_ms, h2d_ms, aug_ms, mb = [], [], [], 0.0
    h2d_triple_ms, mb_triple = [], 0.0
    h2d_packed_ms, mb_packed = [], 0.0
    it = batches(views[0], B, binocular=True, n_timesteps=1, shuffle=True,
                 seed=0)
    for i, batch in enumerate(it):
        if i == 6:
            break
        t0 = time.perf_counter()
        np_batch = {k: np.asarray(v) for k, v in batch.items()}
        t1 = time.perf_counter()
        dev = {k: jnp.asarray(v) for k, v in np_batch.items()}
        jax.block_until_ready(dev)
        # block_until_ready doesn't truly sync on this tunnel backend —
        # fetch one element to bound the upload
        float(dev["gt"].ravel()[0])
        t2 = time.perf_counter()
        key, k = jax.random.split(key)
        out = aug(k, dev)
        float(out["gt"].ravel()[0])
        t3 = time.perf_counter()
        # what the production input path actually uploads since the
        # host-side time-mirror swap (train/loop._upload_augmented):
        # chunks/gt/mask only — init_pots/init_mask stay on host
        triple = {k2: np_batch[k2] for k2 in ("chunks", "gt", "mask")}
        dev_t = {k2: jnp.asarray(v) for k2, v in triple.items()}
        float(dev_t["gt"].ravel()[0])
        t4 = time.perf_counter()
        # the wire-compressed leg (data/packing.py, TrainConfig.pack_io,
        # default on since round 5): fp16 gt + bit-packed mask travel;
        # one jitted device op restores the canonical f32/bool contract
        packed = pack_host(triple)
        dev_p = {k2: jnp.asarray(v) for k2, v in packed.items()}
        unpacked = unpack_jit(dev_p)
        float(unpacked["gt"].ravel()[0])
        t5 = time.perf_counter()
        if i >= 1:  # first iteration pays compile/caches
            assemble_ms.append((t1 - t0) * 1e3)
            h2d_ms.append((t2 - t1) * 1e3)
            aug_ms.append((t3 - t2) * 1e3)
            h2d_triple_ms.append((t4 - t3) * 1e3)
            h2d_packed_ms.append((t5 - t4) * 1e3)
            mb = sum(v.nbytes for v in np_batch.values()) / 1e6
            mb_triple = sum(v.nbytes for v in triple.values()) / 1e6
            mb_packed = sum(np.asarray(v).nbytes
                            for v in packed.values()) / 1e6
    return {
        "batch_mb": round(mb, 1),
        "assemble_ms": round(float(np.median(assemble_ms)), 1),
        "h2d_blocked_ms": round(float(np.median(h2d_ms)), 1),
        "h2d_mbps": round(mb / (np.median(h2d_ms) / 1e3), 0),
        "augment_blocked_ms": round(float(np.median(aug_ms)), 1),
        "uploaded_mb": round(mb_triple, 1),
        "uploaded_h2d_blocked_ms": round(float(np.median(h2d_triple_ms)), 1),
        "uploaded_mb_packed": round(mb_packed, 1),
        "uploaded_h2d_packed_ms": round(
            float(np.median(h2d_packed_ms)), 1),
    }


def measure_rtt():
    x = jnp.ones(())
    float(x)  # first fetch can stall; exclude
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(x + 1.0)
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(float(np.median(ts)), 1)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    rtt = measure_rtt()
    log(f"tunnel RTT (median scalar fetch): {rtt} ms")

    root, views = build_fixture()
    try:
        device_fps = measure_device_resident()
        prep = measure_prep(views)
        log(f"prep decomposition: {prep}")

        runs = {
            "bf16_prefetch2": run_production(views, dtype="bfloat16",
                                             prefetch=2),
            "bf16_prefetch2_nopack": run_production(
                views, dtype="bfloat16", prefetch=2, pack=False),
            "bf16_prefetch0": run_production(views, dtype="bfloat16",
                                             prefetch=0),
            "f32_prefetch2": run_production(views, dtype="float32",
                                            prefetch=2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    best = runs["bf16_prefetch2"]["steady_fps"]
    result = {
        "batch": B,
        "train_samples": len(views[0]),
        "device_kind": dev.device_kind,
        "tunnel_rtt_ms": rtt,
        "device_resident_fps": round(device_fps, 1),
        "production": runs,
        "prep_decomposition": prep,
        "production_over_device_resident": round(best / device_fps, 3),
        "prefetch_speedup": round(
            best / runs["bf16_prefetch0"]["steady_fps"], 2),
        "pack_speedup": round(
            best / runs["bf16_prefetch2_nopack"]["steady_fps"], 2),
        "bf16_over_f32": round(
            best / runs["f32_prefetch2"]["steady_fps"], 2),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    log(json.dumps(result))


if __name__ == "__main__":
    main()
