"""Driver-level tests: checkpoint roundtrip + exact resume, train/eval/
firing-rate loops on synthetic data, CLI, viz."""

import dataclasses
import glob
import warnings
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereospike_tpu.models import init_params, stereospike_tempo
from stereospike_tpu.train import (
    TrainConfig,
    create_train_state,
    make_optimizer,
)
from stereospike_tpu.train.checkpoint import (
    has_checkpoint,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)

SMALL_HW = "48,64"


def _tiny_cfg(tmp, **kw):
    base = dict(
        in_hw=(48, 64), batch_size=2, epochs=2, model="stereospike_tempo",
        checkpoint_dir=os.path.join(tmp, "ckpt"), multiply_factor=10.0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_checkpoint_roundtrip(tmp_path):
    cfg = stereospike_tempo(in_hw=(48, 64))
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    state = state._replace(step=jnp.asarray(7, jnp.int32),
                           best_metric=jnp.asarray(0.25, jnp.float32))
    d = str(tmp_path)
    save_checkpoint(d, state, best=True, tag="epoch_0001")
    assert has_checkpoint(d) and has_checkpoint(d, "best.msgpack")
    assert has_checkpoint(d, "epoch_0001.msgpack")

    fresh = create_train_state(init_params(jax.random.PRNGKey(9), cfg), tx,
                               jax.random.PRNGKey(2))
    restored = restore_checkpoint(d, fresh)
    assert int(restored.step) == 7
    assert float(restored.best_metric) == 0.25
    chex_eq = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params)
    assert all(jax.tree.leaves(chex_eq))

    p = restore_params(d, fresh.params, "best.msgpack")
    np.testing.assert_array_equal(np.asarray(p["bottom"]["w"]),
                                  np.asarray(state.params["bottom"]["w"]))
    meta = json.load(open(os.path.join(d, "checkpoint_meta.json")))
    assert meta["step"] == 7


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """Preemption contract: SIGTERM mid-training persists the exact resume
    point and returns cleanly; --resume continues from that step."""
    import signal
    import threading
    import time

    from stereospike_tpu.train.checkpoint import load_meta
    from stereospike_tpu.train.loop import train_loop

    cfg = _tiny_cfg(str(tmp_path), epochs=200)

    def fire():
        # wait until the loop's guard has installed its handler (firing
        # earlier would hit the default action and kill pytest), give it a
        # beat to take some steps, then deliver the signal
        for _ in range(600):
            if signal.getsignal(signal.SIGTERM) not in (
                    signal.SIG_DFL, signal.SIG_IGN):
                time.sleep(3.0)
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.5)

    t = threading.Thread(target=fire, daemon=True)
    t.start()
    summary = train_loop(cfg, synthetic=True)
    t.join(timeout=60)
    assert summary.get("preempted") is True
    assert summary["step"] >= 1
    assert has_checkpoint(cfg.checkpoint_dir)
    meta = load_meta(cfg.checkpoint_dir)
    assert meta["step"] == summary["step"]
    # the within-epoch batch cursor is saved so --resume continues the
    # interrupted epoch where it left off, not from its first batch
    assert meta["epoch_step_offset"] >= 1
    # the handler was restored on exit
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL,
                                                signal.SIG_IGN)

    resumed = train_loop(dataclasses.replace(cfg, resume=True),
                         synthetic=True, max_steps=summary["step"] + 2)
    assert resumed.get("preempted") is None
    assert load_meta(cfg.checkpoint_dir)["step"] >= summary["step"] + 2


def test_cli_sweep_table3(tmp_path):
    """cli sweep: the paper's Table-3 skip ablation trains + evaluates both
    variants and writes the comparison JSON/markdown."""
    from stereospike_tpu.cli import main

    base = str(tmp_path / "sweep")
    assert main(["sweep", "--table", "table3", "--synthetic",
                 "--max-steps", "1", "--epochs", "1", "--in-hw", "48,64",
                 "--batch-size", "2", "--checkpoint-dir", base]) == 0
    rec = json.load(open(os.path.join(base, "sweep_table3.json")))
    assert [r["name"] for r in rec["rows"]] == ["with_skips", "no_skips"]
    assert all(np.isfinite(r["test_MDE"]) for r in rec["rows"])
    md = open(os.path.join(base, "sweep_table3.md")).read()
    assert "no_skips" in md and "test_MDE" in md
    # each variant kept its own checkpoints
    assert has_checkpoint(os.path.join(base, "with_skips"))
    assert has_checkpoint(os.path.join(base, "no_skips"))


def test_heads_subset_config(tmp_path):
    """Paper Table-2 head subsets are a config knob: heads=(1,) trains and
    returns one depth; invalid subsets are rejected."""
    from stereospike_tpu.train.loop import build_model_config, train_loop

    cfg = _tiny_cfg(str(tmp_path), heads=(1, 2), epochs=1)
    assert build_model_config(cfg).heads == (1, 2)
    # JSON round trip keeps the tuple invariant (frozen config stays usable)
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2.heads == (1, 2) and isinstance(cfg2.heads, tuple)
    summary = train_loop(cfg, synthetic=True, max_steps=1)
    assert np.isfinite(summary["train_loss"])

    for bad in ((2, 3), (0, 1), (1, 5)):
        with pytest.raises(ValueError, match="heads"):
            build_model_config(dataclasses.replace(cfg, heads=bad))


def test_cli_plot_training_curves(trained):
    """cli plot: the JSONL metrics render to the monitoring PNG (loss/MDE/
    lr/firing-rate panels; the fixture logs fr_ taps every epoch)."""
    from stereospike_tpu.cli import main
    from stereospike_tpu.plots import plot_training

    cfg, _ = trained
    out = os.path.join(cfg.checkpoint_dir, "curves.png")
    assert main(["plot", "--checkpoint-dir", cfg.checkpoint_dir,
                 "--out", out]) == 0
    assert os.path.getsize(out) > 10_000
    summary = plot_training(
        os.path.join(cfg.checkpoint_dir, "training_metrics.jsonl"), out)
    assert summary["epochs"] == 2 and summary["firing_rates"]
    assert "best_val_MDE" in summary

    with pytest.raises(ValueError, match="no per-epoch"):
        empty = os.path.join(cfg.checkpoint_dir, "empty.jsonl")
        open(empty, "w").close()
        plot_training(empty, out)


def test_non_lead_process_writes_nothing(tmp_path, monkeypatch):
    """Multi-host hygiene: checkpoint/log/viz side effects are lead-only —
    state and metrics are replicated across hosts, so non-lead writes would
    be redundant device_gets racing identical bytes onto a shared FS."""
    from stereospike_tpu.utils.logging import MetricsLogger, is_lead_process

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert not is_lead_process()

    d = str(tmp_path)
    cfg = stereospike_tempo(in_hw=(48, 64))
    state = create_train_state(init_params(jax.random.PRNGKey(0), cfg),
                               make_optimizer(1e-3), jax.random.PRNGKey(1))
    path = save_checkpoint(d, state, best=True)
    assert path.endswith("latest.msgpack") and not os.path.exists(path)

    logger = MetricsLogger(d, name="t")
    logger.log({"x": 1.0})
    logger.text("hello")
    logger.close()
    assert os.listdir(d) == []

    # lead process (the default) still writes
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    save_checkpoint(d, state)
    logger = MetricsLogger(d, name="t")
    logger.log({"x": 1.0})
    logger.close()
    assert has_checkpoint(d) and os.path.exists(logger.jsonl_path)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One tiny synthetic training run shared by the driver tests."""
    from stereospike_tpu.train.loop import train_loop

    tmp = str(tmp_path_factory.mktemp("run"))
    cfg = _tiny_cfg(tmp, log_firing_rates=1)
    summary = train_loop(cfg, synthetic=True)
    return cfg, summary


def test_train_loop_synthetic(trained):
    cfg, summary = trained
    assert summary["epoch"] == 1
    assert np.isfinite(summary["train_loss"])
    assert np.isfinite(summary["val_MDE"])
    assert summary["best_val_MDE"] <= summary["val_MDE"] + 1e-6
    assert has_checkpoint(cfg.checkpoint_dir)
    assert has_checkpoint(cfg.checkpoint_dir, "best.msgpack")
    lines = open(os.path.join(cfg.checkpoint_dir,
                              "training_metrics.jsonl")).readlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert {"train_loss", "val_MDE", "lr", "epoch"} <= set(rec)
    # training-time firing-rate observability (log_firing_rates=1): every
    # tap logged as a density in [0, 1]
    fr = {k: v for k, v in rec.items() if k.startswith("fr_")}
    assert len(fr) == 14
    assert all(0.0 <= v <= 1.0 for v in fr.values())


def test_resume_continues(trained):
    from stereospike_tpu.train.loop import train_loop

    cfg, _ = trained
    cfg2 = dataclasses.replace(cfg, epochs=3, resume=True)
    summary = train_loop(cfg2, synthetic=True)
    assert summary["epoch"] == 2  # resumed at epoch 2, not 0


def test_eval_loop(trained):
    from stereospike_tpu.train.loop import eval_loop

    cfg, _ = trained
    out = eval_loop(cfg, synthetic=True)
    assert np.isfinite(out["test_loss"]) and out["n_batches"] > 0
    assert os.path.exists(os.path.join(cfg.checkpoint_dir, "test_logs.txt"))


def test_firing_rates_loop(trained):
    from stereospike_tpu.models.stereospike import TAP_NAMES
    from stereospike_tpu.train.loop import firing_rates_loop

    cfg, _ = trained
    rates = firing_rates_loop(cfg, synthetic=True)
    assert set(rates) == set(TAP_NAMES)
    assert all(0.0 <= v <= 1.0 for v in rates.values())
    txt = open(os.path.join(cfg.checkpoint_dir, "firing_rates_logs.txt")).read()
    assert "mean encoder rate" in txt


def test_cli_train_smoke(tmp_path):
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "cli_ckpt")
    rc = main(["train", "--synthetic", "--max-steps", "2",
               "--in-hw", SMALL_HW, "--batch-size", "2", "--epochs", "1",
               "--model", "stereospike_tempo", "--checkpoint-dir", ckpt])
    assert rc == 0
    assert has_checkpoint(ckpt)


def test_cli_save_config(tmp_path):
    from stereospike_tpu.cli import main

    path = str(tmp_path / "cfg.json")
    rc = main(["train", "--save-config", path, "--learning-rate", "0.001",
               "--in-hw", SMALL_HW])
    assert rc == 0
    cfg = TrainConfig.from_json(open(path).read())
    assert cfg.learning_rate == 0.001
    assert cfg.in_hw == (48, 64)


def test_cli_ann_train_and_eval(tmp_path):
    """Paper Table 4 workflow (SNN vs equivalent ANN) as CLI one-liners."""
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "ann_ckpt")
    common = ["--synthetic", "--in-hw", SMALL_HW, "--batch-size", "2",
              "--model", "ann_sigmoid", "--checkpoint-dir", ckpt]
    rc = main(["train", "--max-steps", "2", "--epochs", "1"] + common)
    assert rc == 0
    assert has_checkpoint(ckpt, "best.msgpack")
    rc = main(["eval"] + common)
    assert rc == 0
    assert os.path.exists(os.path.join(ckpt, "test_logs.txt"))


def test_cli_multistep_warmup_initpots(tmp_path):
    """The stateful-model recipe (warmup + init pots, train.py:223-228) and
    the layer-major multistep path, reachable from the CLI."""
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "ms_ckpt")
    rc = main(["train", "--synthetic", "--max-steps", "1", "--epochs", "1",
               "--in-hw", SMALL_HW, "--batch-size", "2",
               "--model", "stereospike_tempo",
               "--n-inference", "2", "--n-timesteps", "2",
               "--multistep", "true", "--use-warmup", "true",
               "--use-init-pots", "true", "--n-warmup", "2",
               "--checkpoint-dir", ckpt])
    assert rc == 0
    assert has_checkpoint(ckpt)


def test_eval_save_viz_and_test_only(trained):
    from stereospike_tpu.train.loop import _make_data, eval_loop

    cfg, _ = trained
    cfg2 = dataclasses.replace(cfg, save_viz=2)
    out = eval_loop(cfg2, synthetic=True)
    assert out["n_batches"] > 0
    pngs = glob.glob(os.path.join(cfg.checkpoint_dir, "visualizations",
                                  "test_*.png"))
    assert len(pngs) >= 1
    # eval data loading touches only the test sequence (test.py:64-67)
    view = _make_data(cfg, True, None, test_only=True)
    assert not isinstance(view, tuple)
    assert len(view.sequences) == 1


def test_device_setup_indivisible_batches(tmp_path):
    from stereospike_tpu.train.loop import _device_setup

    # explicit mesh + indivisible batch must fail loudly
    cfg = _tiny_cfg(str(tmp_path), batch_size=3, mesh_shape=(8, 1))
    with pytest.raises(ValueError, match="not divisible"):
        _device_setup(cfg)
    # auto mesh falls back to single device but WARNS (once per config —
    # reset the memo: an earlier test in the same process may already have
    # consumed this (batch_size, n_devices) pair)
    from stereospike_tpu.train import loop as loop_mod

    loop_mod._WARNED_SINGLE_DEVICE.clear()
    cfg = _tiny_cfg(str(tmp_path), batch_size=3)
    with pytest.warns(UserWarning, match="SINGLE-device"):
        assert _device_setup(cfg) is None
    # and indeed only once: a second identical call stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _device_setup(cfg) is None


def test_viz_panels(tmp_path):
    from stereospike_tpu.viz import make_video, save_panel, show_learning

    chunk = np.random.default_rng(0).poisson(0.5, (32, 40, 4)).astype(np.float32)
    pred = np.random.default_rng(1).uniform(1, 5, (32, 40, 1))
    gt = np.random.default_rng(2).uniform(1, 5, (32, 40, 1))
    mask = np.ones((32, 40, 1), bool)
    img = show_learning(chunk, pred, gt, mask, title="t")
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8

    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        save_panel(p, chunk, pred, gt, mask, title=f"frame {i}")
        paths.append(p)
    out = str(tmp_path / "vid.mp4")
    make_video(paths, out, fps=5)
    assert os.path.getsize(out) > 0


def test_dataset_videos(tmp_path):
    """Depth-map / events-on-depth / event-frame video tooling (reference
    datasets/MVSEC/utils.py:76-213, dense_dataset.py:182-188)."""
    from stereospike_tpu.viz import (
        depth_video,
        event_frames_video,
        events_on_depth_frames,
        events_on_depth_video,
    )

    rng = np.random.default_rng(0)
    depths = rng.uniform(1.0, 9.0, (4, 24, 30)).astype(np.float32)
    depths[0, 0, 0] = np.nan  # invalid pixels must not poison normalization
    depth_ts = np.array([0.05, 0.10, 0.15, 0.20])
    # one ON event before frame 0's ts, one OFF event in frame 2's window
    events = np.array([[3.0, 5.0, 0.01, 1.0],
                       [7.0, 2.0, 0.12, -1.0],
                       [50.0, 2.0, 0.12, 1.0]])  # out of FOV: dropped

    frames = events_on_depth_frames(depths, depth_ts, events)
    assert len(frames) == 4 and frames[0].dtype == np.uint8
    assert tuple(frames[0][5, 3]) == (255, 0, 0)    # ON = red on frame 0
    assert tuple(frames[2][2, 7]) == (0, 0, 255)    # OFF = blue on frame 2
    assert tuple(frames[1][5, 3]) != (255, 0, 0)    # not painted elsewhere

    p1 = str(tmp_path / "depth.mp4")
    depth_video(depths, p1, fps=5)
    p2 = str(tmp_path / "events_on_depth.mp4")
    events_on_depth_video(depths, depth_ts, events, p2, fps=5)
    ev_frames = rng.poisson(0.3, (4, 24, 30, 2)).astype(np.float32)
    p3 = str(tmp_path / "event_frames.mp4")
    event_frames_video(ev_frames, p3, fps=5)
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0


def test_cli_stream_synthetic_and_events_dir(tmp_path):
    """stream subcommand: synthetic binocular serving, then a DENSE-format
    events dir through the monocular model, with a depth video."""
    from stereospike_tpu.cli import main
    from stereospike_tpu.train.loop import stream_loop
    from stereospike_tpu.train.config import TrainConfig

    ckpt = str(tmp_path / "s_ckpt")
    rc = main(["stream", "--synthetic", "--n-windows", "4",
               "--in-hw", SMALL_HW, "--model", "stereospike_tempo",
               "--checkpoint-dir", ckpt])
    assert rc == 0
    rec = json.loads(open(os.path.join(ckpt, "stream_metrics.jsonl")).readline())
    assert rec["n_windows"] == 4 and rec["dropped_events"] == 0

    # DENSE-format events dir (TXYP npy per window) through the monocular
    # model + mp4 output
    from stereospike_tpu.data import make_dense_fixture

    root = str(tmp_path / "dense")
    make_dense_fixture(root, hw=(48, 64), n_maps=3, n_events=500)
    vid = str(tmp_path / "depths.mp4")
    cfg = TrainConfig(model="stereospike_monocular", in_hw=(48, 64),
                      checkpoint_dir=str(tmp_path / "s_ckpt2"))
    out = stream_loop(cfg, events_dir=os.path.join(root, "events", "data"),
                      n_windows=3, pipeline=1, save_video=vid)
    assert out["n_windows"] == 3
    assert os.path.getsize(vid) > 0

    # binocular model rejects a monocular events dir
    with pytest.raises(ValueError, match="monocular"):
        stream_loop(TrainConfig(model="stereospike_tempo", in_hw=(48, 64),
                                checkpoint_dir=str(tmp_path / "s3")),
                    events_dir=os.path.join(root, "events", "data"))


def test_cli_monocular_train_smoke(tmp_path):
    """model=stereospike_monocular end-to-end through the driver (this path
    had a latent in_channels factory conflict that only the library-level
    tests bypassed)."""
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "mono_ckpt")
    rc = main(["train", "--synthetic", "--max-steps", "1", "--epochs", "1",
               "--in-hw", SMALL_HW, "--batch-size", "2",
               "--model", "stereospike_monocular", "--checkpoint-dir", ckpt])
    assert rc == 0
    assert has_checkpoint(ckpt)


@pytest.mark.parametrize("name", ["mvsec_split1_paper.json",
                                  "mvsec_split1_tpu.json"])
def test_paper_run_configs_stay_valid(name, tmp_path):
    """The committed MVSEC runbook configs must keep parsing into
    TrainConfig (guards against config-field drift) and drive the training
    loop (1 synthetic step at reduced resolution)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = TrainConfig.from_json(open(os.path.join(root, "configs", name)).read())
    # the exact paper recipe (reference train.py:60-68, :126-128)
    assert cfg.seed == 2021 and cfg.learning_rate == 2e-4
    assert cfg.lr_milestones == (8, 42, 60) and cfg.lr_gamma == 0.5
    assert cfg.epochs == 70 and cfg.augment and cfg.learn_on == "LIN"
    assert cfg.model == "stereospike_tempo" and cfg.in_hw == (260, 346)

    from stereospike_tpu.train.loop import train_loop

    small = dataclasses.replace(cfg, in_hw=(48, 64), batch_size=2, epochs=1,
                                checkpoint_dir=str(tmp_path / "ck"))
    summary = train_loop(small, synthetic=True, max_steps=1)
    assert np.isfinite(summary["train_loss"])


def test_cli_firing_rates_smoke(tmp_path):
    """firing-rates subcommand end-to-end (reference
    calculate_firing_rates.py workflow as a CLI one-liner)."""
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "fr_ckpt")
    rc = main(["firing-rates", "--synthetic", "--in-hw", SMALL_HW,
               "--batch-size", "2", "--model", "stereospike_tempo",
               "--checkpoint-dir", ckpt])
    assert rc == 0
    txt = open(os.path.join(ckpt, "firing_rates_logs.txt")).read()
    assert "mean encoder rate" in txt and "out_add1" in txt


def test_cli_export_pth_round_trip(tmp_path):
    """export-pth: a checkpoint trained here exports as a reference-layout
    .pth that --import-pth loads back to identical eval numbers."""
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "exp_ckpt")
    common = ["--synthetic", "--in-hw", SMALL_HW, "--batch-size", "2",
              "--model", "stereospike_tempo", "--checkpoint-dir", ckpt]
    assert main(["train", "--max-steps", "2", "--epochs", "1"] + common) == 0

    pth = str(tmp_path / "exported.pth")
    assert main(["export-pth", "--out", pth] + common) == 0
    assert os.path.getsize(pth) > 0

    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import eval_loop

    base = TrainConfig(model="stereospike_tempo", in_hw=(48, 64),
                       batch_size=2, checkpoint_dir=ckpt)
    ref = eval_loop(base, synthetic=True)
    imp = eval_loop(dataclasses.replace(
        base, import_pth=pth, checkpoint_dir=str(tmp_path / "other")),
        synthetic=True)
    assert np.isclose(ref["test_MDE"], imp["test_MDE"], rtol=1e-5)


def test_cli_export_pth_ann(tmp_path):
    from stereospike_tpu.cli import main

    ckpt = str(tmp_path / "annexp_ckpt")
    common = ["--synthetic", "--in-hw", SMALL_HW, "--batch-size", "2",
              "--model", "ann_sigmoid", "--checkpoint-dir", ckpt]
    assert main(["train", "--max-steps", "1", "--epochs", "1"] + common) == 0
    pth = str(tmp_path / "ann.pth")
    assert main(["export-pth", "--out", pth] + common) == 0
    # reloads through the ANN interop loader
    from stereospike_tpu.interop import load_torch_ann_checkpoint

    params, bn_state = load_torch_ann_checkpoint(pth)
    assert "bottom" in params and "bn_bottom" in params
    assert "mean" in bn_state["bn_bottom"]


def test_dense_train_eval_end_to_end(tmp_path):
    """dataset=dense trains/evals from the driver (monocular CARLA tree;
    the reference only ships a loader, dense_dataset.py — here the
    advertised DENSE capability runs end-to-end)."""
    from stereospike_tpu.train.loop import eval_loop, train_loop

    cfg = TrainConfig(dataset="dense", model="stereospike_monocular",
                      in_hw=(48, 64), batch_size=2, epochs=1, learn_on="LOG",
                      checkpoint_dir=str(tmp_path / "dense_ckpt"))
    summary = train_loop(cfg, synthetic=True, max_steps=2)
    assert np.isfinite(summary["train_loss"])
    assert has_checkpoint(cfg.checkpoint_dir)
    results = eval_loop(cfg, synthetic=True)
    assert np.isfinite(results["test_MDE"]) and results["n_samples"] >= 1


def test_dense_guard_rejects_bad_configs(tmp_path):
    from stereospike_tpu.train.loop import train_loop

    bad = [
        dict(model="stereospike"),                       # binocular
        dict(model="stereospike_monocular", n_timesteps=2, n_inference=2),
        dict(model="stereospike_monocular", use_warmup=True),
        dict(model="stereospike_monocular", learn_on="DISP"),
    ]
    for kw in bad:
        cfg = TrainConfig(dataset="dense", in_hw=(48, 64),
                          checkpoint_dir=str(tmp_path / "x"), **kw)
        with pytest.raises(ValueError):
            train_loop(cfg, synthetic=True, max_steps=1)


def test_cli_export_pth_requires_checkpoint(tmp_path):
    """A typo'd --checkpoint-dir must not silently export random-init
    weights as a valid-looking .pth."""
    from stereospike_tpu.cli import main

    with pytest.raises(FileNotFoundError, match="refusing to export"):
        main(["export-pth", "--out", str(tmp_path / "x.pth"),
              "--in-hw", SMALL_HW, "--model", "stereospike_tempo",
              "--checkpoint-dir", str(tmp_path / "does_not_exist")])


def test_depth_to_rgb_scales_over_valid_pixels_only():
    """A frame with one NaN must not have its valid range crushed into the
    upper band (lo must come from nanmin, not from the zeroed NaN)."""
    from stereospike_tpu.viz import _depth_to_rgb

    d = np.full((4, 4), 5.0, np.float32)
    d[0, 0] = np.nan
    d[3, 3] = 9.0
    rgb = _depth_to_rgb(d)
    assert rgb[0, 0, 0] == 0     # invalid → black
    assert rgb[1, 1, 0] == 0     # min valid maps to 0, not mid-band
    assert rgb[3, 3, 0] == 255
    assert _depth_to_rgb(np.full((2, 2), np.nan, np.float32)).max() == 0


def test_blended_and_mosaic_videos(tmp_path):
    """The reference's dataset preview mosaics (mvsecShowBlended +
    mvsecShowDepth's L/R/raw/blended layout) render headlessly to mp4."""
    from stereospike_tpu.viz import blended_video, depth_mosaic_video

    rng = np.random.default_rng(0)
    n, h, w = 4, 20, 28
    depth = rng.uniform(1.0, 6.0, (n, h, w)).astype(np.float32)
    depth[0, 0, 0] = np.nan
    blended = rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)

    p1 = str(tmp_path / "blended.mp4")
    blended_video(blended, blended, p1)
    assert os.path.getsize(p1) > 0

    p2 = str(tmp_path / "mosaic.mp4")
    depth_mosaic_video(depth, depth, depth, depth, blended, blended, p2)
    assert os.path.getsize(p2) > 0

    # grayscale blended previews are accepted too (NaN-free: casting NaN
    # to uint8 is UB and warns — real grayscale previews are count frames)
    gray = np.nan_to_num(depth).astype(np.uint8)
    blended_video(gray, gray, str(tmp_path / "gray.mp4"))


def test_metrics_logger_writes_tensorboard_events(tmp_path):
    """The reference logs TB scalars (train.py:173,272-273,344-345): when
    the tensorboard package is importable the logger writes real event
    files next to the JSONL sink; tensorboard=False keeps them off."""
    pytest.importorskip("tensorboard")
    from stereospike_tpu.utils.logging import MetricsLogger

    d = str(tmp_path / "tb_on")
    logger = MetricsLogger(d, name="training")
    logger.log({"train_loss": 1.5, "train_MDE": 0.3, "note": "str-skipped"},
               epoch=0)
    logger.log({"train_loss": 1.2, "train_MDE": 0.2}, epoch=1)
    logger.close()
    tb_dir = os.path.join(d, "tb_training")
    files = os.listdir(tb_dir)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents")
    raw = open(os.path.join(tb_dir, files[0]), "rb").read()
    assert b"train_loss" in raw and b"train_MDE" in raw
    assert b"note" not in raw

    d2 = str(tmp_path / "tb_off")
    logger = MetricsLogger(d2, name="training", tensorboard=False)
    logger.log({"train_loss": 1.0}, epoch=0)
    logger.close()
    assert not os.path.exists(os.path.join(d2, "tb_training"))


def test_metrics_logger_tb_steps_distinct_across_reruns(tmp_path):
    """Step-less loggers (eval/firing-rates/stream) re-run into the same
    directory must emit TB events at DISTINCT, increasing global_steps —
    seeded from the JSONL record count — instead of stacking every run's
    point at step 0. Explicit steps pass through unchanged and do not
    advance the fallback counter."""
    from stereospike_tpu.utils import logging as ulog

    calls = []

    class SpyTB:
        def scalars(self, scalars, step, wall_time):
            calls.append(step)

        def close(self):
            pass

    orig = ulog._TBWriter.create
    ulog._TBWriter.create = staticmethod(lambda d: SpyTB())
    try:
        d = str(tmp_path)
        for _ in range(3):  # three successive step-less runs (e.g. cli eval)
            logger = ulog.MetricsLogger(d, name="test")
            logger.log({"test_MDE": 0.5})
            logger.close()
        assert calls == [0, 1, 2]

        calls.clear()
        logger = ulog.MetricsLogger(d, name="test")
        logger.log({"a": 1.0}, step=42)   # explicit step passes through
        logger.log({"a": 2.0})            # fallback unaffected by it
        logger.close()
        assert calls == [42, 3]
    finally:
        ulog._TBWriter.create = orig
