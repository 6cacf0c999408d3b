"""Serving artifacts (deploy.py): the exported StableHLO step reproduces
the live evaluator and round-trips through serialize → zip → load with no
model code on the consuming side (only jax.export's deserialize)."""

import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.deploy import (
    ServingArtifact,
    export_serving_artifact,
    load_serving_artifact,
)
from stereospike_tpu.models import init_params, stereospike_tempo
from stereospike_tpu.streaming import StreamingEvaluator

HW = (48, 64)


def _make_evaluator(n_streams=1, block=256, dtype=None):
    cfg = stereospike_tempo(in_hw=HW)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return StreamingEvaluator(params, cfg, eyes=("left", "right"), nfpdm=1,
                              window=0.05, block=block, n_streams=n_streams,
                              compute_dtype=dtype)


def _events(rng, s, block, n=None):
    """[S, block, 4] (x, y, t_rel, p) + valid mask, zero-padded."""
    n = block // 2 if n is None else n
    ev = np.zeros((s, block, 4), np.float32)
    ev[:, :n, 0] = rng.integers(0, HW[1], (s, n))
    ev[:, :n, 1] = rng.integers(0, HW[0], (s, n))
    ev[:, :n, 2] = rng.uniform(0.0, 0.05, (s, n))
    ev[:, :n, 3] = rng.integers(0, 2, (s, n))
    valid = np.zeros((s, block), bool)
    valid[:, :n] = True
    return ev, valid


def test_artifact_matches_live_evaluator(tmp_path):
    ev = _make_evaluator()
    path = str(tmp_path / "model.ssx")
    manifest = export_serving_artifact(ev, path, extra_meta={"model": "t"})
    assert manifest["block"] == 256 and manifest["eyes"] == ["left", "right"]

    art = load_serving_artifact(path)
    assert art.meta["model"] == "t"
    state = art.init_state()
    live_state = jax.tree.map(jnp.zeros_like, state)  # same zeros
    rng = np.random.default_rng(3)
    for step in range(3):  # state threads across windows on both sides
        evs = {}
        valids = {}
        for e in ev.eyes:
            evs[e], valids[e] = _events(rng, 1, ev.block)
        depth, state, rejected = art.step(state, evs, valids)
        live_depth, live_state, live_rej = ev._step(
            ev.params, live_state, jax.tree.map(jnp.asarray, evs),
            jax.tree.map(jnp.asarray, valids))
        assert depth.shape == (1, *HW, 1) and depth.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(depth),
                                      np.asarray(live_depth),
                                      err_msg=f"step {step}")
        np.testing.assert_array_equal(np.asarray(rejected),
                                      np.asarray(live_rej))
    assert float(rejected) == 0.0  # all timestamps inside the window


def test_artifact_rejects_out_of_window_events(tmp_path):
    ev = _make_evaluator()
    path = str(tmp_path / "m.ssx")
    export_serving_artifact(ev, path)
    art = load_serving_artifact(path)
    rng = np.random.default_rng(0)
    evs, valids = {}, {}
    for e in ev.eyes:
        evs[e], valids[e] = _events(rng, 1, ev.block, n=10)
    evs["left"][0, :5, 2] = 9.9  # way past the 50 ms window
    _, _, rejected = art.step(art.init_state(), evs, valids)
    assert int(rejected) == 5


def test_multistream_bf16_artifact(tmp_path):
    ev = _make_evaluator(n_streams=2, dtype=jnp.bfloat16)
    path = str(tmp_path / "m2.ssx")
    m = export_serving_artifact(ev, path)
    assert m["n_streams"] == 2 and m["compute_dtype"] == "bfloat16"
    art = load_serving_artifact(path)
    state = art.init_state()
    assert jax.tree.leaves(state)[0].dtype == jnp.bfloat16
    rng = np.random.default_rng(1)
    evs, valids = {}, {}
    for e in ev.eyes:
        evs[e], valids[e] = _events(rng, 2, ev.block)
    depth, state, _ = art.step(state, evs, valids)
    # float32 depths out regardless of the serving compute dtype
    assert depth.shape == (2, *HW, 1) and depth.dtype == jnp.float32
    assert np.isfinite(np.asarray(depth)).all()


def test_multiplatform_export_runs_on_cpu(tmp_path):
    """An artifact lowered for BOTH cpu and tpu (built on whatever backend
    the tests run on) still executes here — the cross-platform deploy
    path: export on a CPU build box, serve on TPU."""
    ev = _make_evaluator()
    path = str(tmp_path / "xp.ssx")
    m = export_serving_artifact(ev, path, platforms=("cpu", "tpu"))
    assert m["platforms"] == ["cpu", "tpu"]
    art = load_serving_artifact(path)
    rng = np.random.default_rng(2)
    evs, valids = {}, {}
    for e in ev.eyes:
        evs[e], valids[e] = _events(rng, 1, ev.block)
    depth, _, _ = art.step(art.init_state(), evs, valids)
    assert np.isfinite(np.asarray(depth)).all()


def test_from_artifact_evaluator_matches_live(tmp_path):
    """StreamingEvaluator.from_artifact: the artifact-backed evaluator's
    push() (ring buffers + padding + the exported step) returns the same
    depths as the live evaluator on identical windows."""
    ev = _make_evaluator()
    path = str(tmp_path / "s.ssx")
    export_serving_artifact(ev, path)
    from stereospike_tpu.streaming import StreamingEvaluator

    ev2 = StreamingEvaluator.from_artifact(path)
    assert ev2.block == ev.block and ev2.eyes == ev.eyes
    rng = np.random.default_rng(5)
    for _ in range(2):
        win = {}
        for e in ev.eyes:
            evts, _ = _events(rng, 1, 64, n=50)
            win[e] = evts[0, :50]
        d1 = ev.push(dict(win))
        d2 = ev2.push(dict(win))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    ev2.reset()  # the exported zero-state initializer backs reset()


def test_stream_loop_serves_from_artifact(tmp_path):
    """cli stream --artifact: the deployment artifact drives the full
    serving loop (source → ring buffers → exported step → latency JSONL)."""
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import stream_loop

    ev = _make_evaluator()
    path = str(tmp_path / "serve.ssx")
    export_serving_artifact(ev, path)
    cfg = TrainConfig(in_hw=(260, 346),  # ignored: geometry from manifest
                      checkpoint_dir=str(tmp_path / "ck"))
    res = stream_loop(cfg, synthetic=True, n_windows=4, pipeline=1,
                      events_per_window=500, artifact=path)
    assert res["n_windows"] == 4
    assert res["interval_ms_mean"] > 0


def test_version_guard(tmp_path):
    ev = _make_evaluator()
    path = str(tmp_path / "v.ssx")
    export_serving_artifact(ev, path)
    bad = str(tmp_path / "bad.ssx")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(bad, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "manifest.json":
                data = data.replace(b'"format_version": 1',
                                    b'"format_version": 99')
            zout.writestr(item, data)
    with pytest.raises(ValueError, match="version"):
        ServingArtifact.load(bad)


def test_cli_export_serving(tmp_path):
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    common = ["--synthetic", "--in-hw", "48,64", "--batch-size", "2",
              "--model", "stereospike_tempo", "--checkpoint-dir", ckpt]
    assert main(["train", "--max-steps", "2", "--epochs", "1"] + common) == 0
    out = str(tmp_path / "sub" / "m.ssx")  # parent dir created by exporter
    # sloppy --platforms ("cpu, " with space + trailing comma) still parses
    assert main(["export-serving", "--out", out, "--block", "256",
                 "--platforms", "cpu, "] + common) == 0
    art = load_serving_artifact(out)
    assert art.meta["platforms"] == ["cpu"]
    assert art.meta["model"] == "stereospike_tempo"
    assert art.meta["in_hw"] == [48, 64]
    rng = np.random.default_rng(4)
    evs, valids = {}, {}
    for e in ("left", "right"):
        evs[e], valids[e] = _events(rng, 1, 256)
    depth, _, _ = art.step(art.init_state(), evs, valids)
    assert depth.shape == (1, 48, 64, 1)

    # a missing checkpoint must fail loudly, not export random weights
    with pytest.raises(FileNotFoundError):
        main(["export-serving", "--out", str(tmp_path / "x.ssx"),
              "--checkpoint-dir", str(tmp_path / "nope"), "--synthetic",
              "--in-hw", "48,64", "--model", "stereospike_tempo"])
