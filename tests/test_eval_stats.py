"""Exact per-sample eval statistics + T-aware firing rates.

The reference accumulates per-sample scalars at batch_size=1
(train.py:275-335, test.py:157-173, calculate_firing_rates.py:125-148);
these tests pin that the framework's batched eval reproduces the identical
per-sample math at batch_size > 1 with drop_last=False.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.models import (
    firing_rates,
    firing_rates_sequence,
    init_params,
    stereospike,
)
from stereospike_tpu.objectives import TotalLossConfig
from stereospike_tpu.train import TrainConfig
from stereospike_tpu.train.steps import make_eval_step

HW = (48, 64)


def _batch(rng, b, hw=HW, c=4, t=1):
    h, w = hw
    return {
        "chunks": rng.poisson(0.3, (b, t, h, w, c)).astype(np.float32),
        "gt": rng.uniform(1.0, 6.0, (b, h, w, 1)).astype(np.float32),
        # deliberately different valid-pixel counts per sample — pixel-pooled
        # batch statistics would weight samples unequally
        "mask": np.stack([rng.random((h, w, 1)) < (0.3 + 0.6 * i / b)
                          for i in range(b)]),
    }


def test_eval_step_is_per_sample_mean():
    cfg = stereospike(in_hw=HW)
    params = init_params(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_eval_step(cfg, TotalLossConfig()))
    rng = np.random.default_rng(7)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, 3).items()}

    out = step(params, batch)
    singles = [
        step(params, {k: v[i:i + 1] for k, v in batch.items()})
        for i in range(3)
    ]
    np.testing.assert_allclose(
        float(out["loss"]), np.mean([float(s["loss"]) for s in singles]),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(out["mde"]), np.mean([float(s["mde"]) for s in singles]),
        rtol=1e-5)


def test_eval_loop_batch_size_invariant(tmp_path):
    """Dataset-level test_MDE/test_loss are independent of batch size —
    batch 3 over 5 test samples (a short final batch) equals the manual
    per-sample (batch 1) loop."""
    from stereospike_tpu.train.loop import eval_loop

    results = {}
    for bs in (1, 3):
        cfg = TrainConfig(
            in_hw=HW, batch_size=bs, model="stereospike",
            checkpoint_dir=os.path.join(str(tmp_path), f"bs{bs}"))
        results[bs] = eval_loop(cfg, synthetic=True)
    assert results[3]["n_samples"] == results[1]["n_samples"] == 5
    np.testing.assert_allclose(results[3]["test_MDE"], results[1]["test_MDE"],
                               rtol=1e-5)
    np.testing.assert_allclose(results[3]["test_loss"],
                               results[1]["test_loss"], rtol=1e-5)


def test_firing_rates_sequence_t1_matches_single_step():
    cfg = stereospike(in_hw=HW)
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    chunks = jnp.asarray(rng.poisson(0.5, (2, 1, *HW, 4)).astype(np.float32))
    seq = firing_rates_sequence(params, chunks, cfg)
    single = firing_rates(params, chunks[:, 0], cfg)
    for k in seq:
        np.testing.assert_allclose(float(seq[k]), float(single[k]), atol=1e-7)


def test_firing_rates_sequence_carries_state_over_t():
    """At T>1 the densities must reflect the stateful sequence (later steps
    start from carried membrane potentials), not just step 0."""
    cfg = stereospike(in_hw=HW)
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(5)
    step0 = rng.poisson(0.5, (2, 1, *HW, 4)).astype(np.float32)
    hot = rng.poisson(2.0, (2, 1, *HW, 4)).astype(np.float32)
    chunks = jnp.asarray(np.concatenate([step0, hot], axis=1))  # T=2

    seq = firing_rates_sequence(params, chunks, cfg)
    only0 = firing_rates(params, chunks[:, 0], cfg)
    # densities over {step0, hot-step-with-carried-state} differ from step 0
    assert any(abs(float(seq[k]) - float(only0[k])) > 1e-4 for k in seq)

    # and the scan mean equals the manual two-step stateful average
    from stereospike_tpu.models.stereospike import forward

    _, _, st, taps0 = forward(params, chunks[:, 0], cfg, return_taps=True)
    _, _, _, taps1 = forward(params, chunks[:, 1], cfg, st, return_taps=True)
    for k in seq:
        d0 = np.count_nonzero(np.asarray(taps0[k])) / taps0[k].size
        d1 = np.count_nonzero(np.asarray(taps1[k])) / taps1[k].size
        np.testing.assert_allclose(float(seq[k]), (d0 + d1) / 2, atol=1e-6)


def test_ann_rejects_multi_timestep():
    from stereospike_tpu.train.loop import build_ann_config

    cfg = TrainConfig(model="ann", n_timesteps=2, n_inference=2, in_hw=HW)
    with pytest.raises(ValueError, match="single-step"):
        build_ann_config(cfg)
