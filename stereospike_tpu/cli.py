"""Command-line interface: ``python -m stereospike_tpu.cli <command>``.

Replaces the reference's edit-the-constants workflow (README: "edit them and
adapt them to your needs"; train.py:60-68) with subcommands over a
:class:`TrainConfig`:

    train         full training run (epochs, val, best/latest checkpoints)
    eval          offline test-set evaluation from a checkpoint
    firing-rates  per-layer spike-density profiling (calculate_firing_rates)
    bench         single-chip training-throughput benchmark
    stream        low-latency streaming serving (events in, depth maps out)
    export-pth    checkpoint out as a reference torch .pth state dict
    export-serving  serving step (weights baked) as a jax.export artifact
    sweep         paper-table ablation sweeps (Tables 2/3/4) in one command
    plot          training curves (loss/MDE/lr/firing rates) from the JSONL
    doctor        environment diagnostics (device reachability with timeouts)

``--synthetic`` runs any command on a generated on-disk fixture — no MVSEC
download needed. ``--config file.json`` loads a saved config; flags override.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import typing

import numpy as np

from stereospike_tpu.train.config import TrainConfig


def _parse_bool(s: str) -> bool:
    return s.lower() in ("1", "true", "yes")


def _flag_parser(tp):
    """argparse ``type=`` callable for a (possibly Optional/Tuple) annotation.

    Works from the *resolved* type objects (typing.get_type_hints), not the
    stringified annotations, so new config fields parse correctly by
    construction."""
    origin = typing.get_origin(tp)
    if origin is typing.Union:  # Optional[X] → X
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) != 1:
            raise TypeError(f"unsupported Union annotation {tp}")
        tp = args[0]
        origin = typing.get_origin(tp)
    if tp is bool:
        return _parse_bool, "BOOL"
    if origin is tuple:
        elem = typing.get_args(tp)[0]

        def parse_tuple(s: str, elem=elem):
            return tuple(elem(x) for x in s.split(","))

        return parse_tuple, "X,Y,..."
    if tp in (int, float, str):
        return tp, None
    raise TypeError(f"unsupported config annotation {tp}")


def _add_config_flags(p: argparse.ArgumentParser) -> None:
    hints = typing.get_type_hints(TrainConfig)
    for field in dataclasses.fields(TrainConfig):
        parser, metavar = _flag_parser(hints[field.name])
        p.add_argument("--" + field.name.replace("_", "-"), type=parser,
                       default=None, metavar=metavar)


def _require_exportable_weights(cfg: TrainConfig, which: str) -> None:
    """Shared guard for the export commands: ``_load_params`` falls back to
    fresh init when no checkpoint exists (fine for train warm-starts);
    exporting untrained random weights as a valid-looking artifact is not —
    a typo'd --checkpoint-dir must fail loudly."""
    from stereospike_tpu.train.checkpoint import has_checkpoint

    if not (cfg.import_pth or has_checkpoint(cfg.checkpoint_dir, which)):
        raise FileNotFoundError(
            f"no checkpoint {which!r} in {cfg.checkpoint_dir!r} and no "
            "--import-pth; refusing to export fresh random-init weights")


def _build_config(args: argparse.Namespace) -> TrainConfig:
    if args.config:
        with open(args.config) as f:
            cfg = TrainConfig.from_json(f.read())
    else:
        cfg = TrainConfig()
    overrides = {
        field.name: getattr(args, field.name)
        for field in dataclasses.fields(TrainConfig)
        if getattr(args, field.name, None) is not None
    }
    return dataclasses.replace(cfg, **overrides)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="stereospike_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    for name, helptext in [
        ("train", "train a model"),
        ("eval", "evaluate a checkpoint on the test set"),
        ("firing-rates", "profile per-layer spike densities"),
        ("bench", "measure training throughput"),
        ("stream", "streaming serving: events in, depth maps out"),
        ("export-pth", "export a checkpoint as a reference torch .pth"),
        ("export-serving", "export the serving step (weights baked in) as a "
                           "portable StableHLO artifact (.ssx)"),
        ("sweep", "run a paper-table ablation sweep (train+eval per variant)"),
        ("plot", "render training curves from a run's JSONL metrics"),
        ("doctor", "probe the environment: device, tunnel, cache, native ops"),
    ]:
        p = sub.add_parser(name, help=helptext)
        p.add_argument("--config", type=str, default=None,
                       help="JSON config file (flags override)")
        p.add_argument("--synthetic", action="store_true",
                       help="run on a generated synthetic fixture")
        p.add_argument("--max-steps", type=int, default=None,
                       help="stop after N optimizer steps (smoke runs)")
        p.add_argument("--platform", type=str, default=None,
                       choices=("cpu", "tpu", "gpu"),
                       help="force a jax backend (JAX_PLATFORMS env alone "
                            "does not switch on tunneled-device hosts)")
        p.add_argument("--save-config", type=str, default=None,
                       help="write the resolved config to this path and exit")
        if name == "export-pth":
            p.add_argument("--out", type=str, required=True,
                           help="output .pth path")
            p.add_argument("--which", type=str, default="best.msgpack",
                           help="checkpoint file to export")
        if name == "export-serving":
            p.add_argument("--out", type=str, required=True,
                           help="output .ssx artifact path")
            p.add_argument("--which", type=str, default="best.msgpack",
                           help="checkpoint file to export")
            p.add_argument("--platforms", type=str, default=None,
                           help="comma-separated lowering targets (e.g. "
                                "cpu,tpu); default = current backend")
            p.add_argument("--block", type=int, default=1 << 16,
                           help="events per eye per window (pad/truncate)")
            p.add_argument("--n-streams", type=int, default=1,
                           help="cameras served per batched step")
            p.add_argument("--window-s", type=float, default=0.05,
                           help="binning window the step is built for")
        if name == "sweep":
            p.add_argument("--table", type=str, required=True,
                           help="which paper table to reproduce "
                                "(table2 = prediction heads, table3 = "
                                "skips, table4 = SNN vs ANN)")
        if name == "plot":
            p.add_argument("--out", type=str, default=None,
                           help="output PNG (default <checkpoint-dir>/"
                                "training_curves.png)")
            p.add_argument("--name", type=str, default="training",
                           help="which JSONL to plot (<name>_metrics.jsonl)")
            p.add_argument("--title", type=str, default=None)
        if name == "doctor":
            p.add_argument("--device-timeout", type=float, default=240.0,
                           help="seconds before declaring the accelerator "
                                "unreachable; default sits above the ~150 s "
                                "healthy first-fetch stall of tunneled chips")
        if name == "stream":
            p.add_argument("--events-dir", type=str, default=None,
                           help="DENSE-format events/data dir (one .npy "
                                "TXYP file per window; monocular)")
            p.add_argument("--n-windows", type=int, default=20,
                           help="windows to serve; with --listen, 0 serves "
                                "until producers stop reconnecting")
            p.add_argument("--pipeline", type=int, default=1,
                           help="windows in flight (0 = synchronous)")
            p.add_argument("--save-video", type=str, default=None,
                           help="write the served depth maps to this mp4")
            p.add_argument("--aer-format", type=str, default="TXYP",
                           choices=("TXYP", "XYTP"),
                           help="column order of the events-dir .npy files")
            p.add_argument("--aedat", type=str, default=None,
                           help="replay an AEDAT 3.1 recording (iniVation "
                                "DAVIS/DVS); one path, or left,right paths "
                                "for a stereo rig")
            p.add_argument("--realtime", action="store_true",
                           help="pace --aedat replay to the recording "
                                "cadence (one window per window_s) instead "
                                "of serving as fast as the chip allows")
            p.add_argument("--listen", type=str, default=None,
                           help="accept a live SPKE-protocol TCP event feed "
                                "on host:port (or just a port); see "
                                "stereospike_tpu.sources")
            p.add_argument("--reply", action="store_true",
                           help="send depth maps back to the --listen "
                                "producer over the same connection")
            p.add_argument("--artifact", type=str, default=None,
                           help="serve from an exported .ssx deployment "
                                "artifact (export-serving) instead of "
                                "live params")
        _add_config_flags(p)

    args = parser.parse_args(argv)
    cfg = _build_config(args)

    # persistent XLA compilation cache: repeat CLI invocations skip the
    # multi-minute first compile of the U-Net programs
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stereospike_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.save_config:
        with open(args.save_config, "w") as f:
            f.write(cfg.to_json())
        print(f"wrote {args.save_config}")
        return 0

    if args.command == "train":
        from stereospike_tpu.train.loop import train_loop

        summary = train_loop(cfg, synthetic=args.synthetic,
                             max_steps=args.max_steps)
        print(json.dumps(summary))
    elif args.command == "eval":
        from stereospike_tpu.train.loop import eval_loop

        print(json.dumps(eval_loop(cfg, synthetic=args.synthetic)))
    elif args.command == "firing-rates":
        from stereospike_tpu.train.loop import firing_rates_loop

        print(json.dumps(firing_rates_loop(cfg, synthetic=args.synthetic)))
    elif args.command == "bench":
        import bench as bench_mod  # repo-root bench.py

        bench_mod.main()
    elif args.command == "export-pth":
        # our checkpoint → reference torch state dict (interop.py), so a
        # model trained here can be evaluated by the reference scripts
        import torch

        from stereospike_tpu.train.loop import build_ann_config, \
            build_model_config, is_ann_model

        if is_ann_model(cfg.model):
            from stereospike_tpu.interop import ann_params_to_torch_state_dict
            from stereospike_tpu.models.ann import (
                init_ann_params,
                init_ann_state,
            )
            from stereospike_tpu.train.checkpoint import restore_fields

            ann_cfg = build_ann_config(cfg)
            import jax as _jax

            tpl = {"params": init_ann_params(_jax.random.PRNGKey(cfg.seed),
                                             ann_cfg),
                   "bn_state": init_ann_state(ann_cfg)}
            restored = restore_fields(cfg.checkpoint_dir, tpl, args.which)
            sd = ann_params_to_torch_state_dict(restored["params"],
                                                restored["bn_state"])
        else:
            from stereospike_tpu.interop import params_to_torch_state_dict
            from stereospike_tpu.train.loop import _load_params

            _require_exportable_weights(cfg, args.which)
            params = _load_params(cfg, build_model_config(cfg), args.which)
            sd = params_to_torch_state_dict(params)
        # np.array(copy) first: jax gives read-only numpy views and torch
        # warns on (and forbids writing through) non-writable tensors
        torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                   args.out)
        print(json.dumps({"exported": args.out, "n_tensors": len(sd)}))
    elif args.command == "export-serving":
        # the jitted serving step (voxelize → stateful forward, weights
        # baked as constants) as a self-contained jax.export artifact a
        # consumer runs with ONLY jax installed (deploy.py)
        from stereospike_tpu.deploy import export_serving_artifact
        from stereospike_tpu.streaming import StreamingEvaluator
        from stereospike_tpu.train.loop import (
            _compute_dtype,
            _load_params,
            build_model_config,
            is_ann_model,
        )

        if is_ann_model(cfg.model):
            raise ValueError("serving artifacts wrap the stateful SNN "
                             "models; ANN checkpoints export via export-pth")
        _require_exportable_weights(cfg, args.which)
        model_cfg = build_model_config(cfg)
        params = _load_params(cfg, model_cfg, args.which)
        eyes = (("left",) if cfg.model == "stereospike_monocular"
                else ("left", "right"))
        evaluator = StreamingEvaluator(
            params, model_cfg, eyes=eyes, nfpdm=cfg.nfpdm,
            window=args.window_s, block=args.block,
            n_streams=args.n_streams, compute_dtype=_compute_dtype(cfg))
        platforms = (tuple(s.strip() for s in args.platforms.split(",")
                           if s.strip())
                     if args.platforms else None)
        manifest = export_serving_artifact(
            evaluator, args.out, platforms=platforms,
            extra_meta={"model": cfg.model})
        print(json.dumps({
            "exported": args.out,
            "bytes": os.path.getsize(args.out),
            **{k: manifest[k]
               for k in ("platforms", "eyes", "block", "n_streams")},
        }))
    elif args.command == "sweep":
        from stereospike_tpu.sweep import TABLES, run_sweep

        if args.table not in TABLES:
            raise ValueError(f"unknown table {args.table!r}; "
                             f"available: {sorted(TABLES)}")
        record = run_sweep(cfg, TABLES[args.table], name=args.table,
                           synthetic=args.synthetic,
                           max_steps=args.max_steps)
        print(json.dumps(record, default=str))
    elif args.command == "plot":
        from stereospike_tpu.plots import plot_training

        jsonl = os.path.join(cfg.checkpoint_dir,
                             f"{args.name}_metrics.jsonl")
        out = args.out or os.path.join(cfg.checkpoint_dir,
                                       "training_curves.png")
        print(json.dumps(plot_training(jsonl, out, title=args.title)))
    elif args.command == "doctor":
        from stereospike_tpu.doctor import run_doctor

        report = run_doctor(device_timeout_s=args.device_timeout,
                            data_root=cfg.data_root)
        print(json.dumps(report, indent=2))
        return 0 if report["ok"] else 2
    elif args.command == "stream":
        from stereospike_tpu.train.loop import stream_loop

        print(json.dumps(stream_loop(
            cfg, synthetic=args.synthetic, events_dir=args.events_dir,
            n_windows=args.n_windows, pipeline=args.pipeline,
            save_video=args.save_video, aer_format=args.aer_format,
            listen=args.listen, reply=args.reply,
            artifact=args.artifact, aedat=args.aedat,
            realtime=args.realtime)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
