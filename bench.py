#!/usr/bin/env python
"""Benchmark: StereoSpike training throughput on one TPU chip.

Metric: event frames/sec/chip through the FULL training step (forward over
T timesteps + BPTT + Adam update) of the flagship binocular StereoSpike at
the reference resolution 260×346 (BASELINE.json north-star metric).

Besides the headline T=1 number, measures the T>1 temporal paths: the
step-major ``lax.scan`` forward vs the layer-major fused-Pallas multistep
path (``models/multistep.py`` — the TPU analog of SpikingJelly's CUDA
multi-step neurons, the reference stack's only native acceleration,
``/root/reference/README.md:42-44``).

``vs_baseline`` compares against the reference implementation measured on
the hardware available to it here (torch CPU, batch 1 — the reference's own
configuration, train.py:63); see ``benchmarks/reference_torch_baseline.py``.
Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))


def measure(batch: int = 16, iters: int = 20, warmup: int = 3,
            compute_dtype=jnp.bfloat16, T: int = 1,
            multistep: bool = False) -> float:
    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = stereospike()  # flagship at (260, 346)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(2e-4)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    batch_data = synthetic_batch(
        jax.random.PRNGKey(2), batch=batch, in_hw=cfg.in_hw, T=T)
    # donate the train state: params/optimizer buffers update in place
    step = jax.jit(make_train_step(
        cfg, TotalLossConfig(), tx, compute_dtype=compute_dtype,
        multistep=multistep, remat=(T > 4 and not multistep)),
        donate_argnums=(0,))

    for _ in range(warmup):
        state, metrics = step(state, batch_data)
    float(metrics["loss"])  # value fetch = true device sync on this backend

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * T * iters / dt


def _require_device(timeout_s: float) -> bool:
    """Backend init + one tiny round trip under a hard timeout: a wedged
    device tunnel (seen on this backend after killed client processes)
    hangs even jax.devices() — emit a structured failure line instead of
    hanging the whole benchmark run."""
    import threading

    ok = {}

    def probe():
        jax.devices()
        ok["v"] = float(jnp.ones(()) + 1.0)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok.get("v") == 2.0


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    watchdog = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "1200"))
    if not _require_device(watchdog):
        print(json.dumps({
            "metric": "event frames/sec/chip (StereoSpike 260x346 train step, fwd+bwd+adam)",
            "value": None,
            "unit": "frames/s",
            "vs_baseline": None,
            "error": f"device unreachable within {watchdog:.0f} s "
                     "(wedged tunnel — see CLAUDE.md); last committed "
                     "measurement: 719.9 f/s, mfu 0.675 (BENCH task r03 "
                     "artifacts, benchmarks/)",
        }))
        return
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t_multi = int(os.environ.get("BENCH_T", "5"))
    # B·T = 80 frames in flight: the step-major scan stores O(T) membrane
    # carries for BPTT, which bounds the batch on a 16 GB chip
    batch_multi = int(os.environ.get("BENCH_BATCH_T", "16"))
    fps = measure(batch=batch, iters=iters)
    # the T>1 comparison is auxiliary: if the backend degrades mid-run
    # (this environment's tunnel can wedge), still report the headline
    fps_t_scan = fps_t_ms = fps_t1_matched = None
    try:
        fps_t_scan = measure(batch=batch_multi, iters=iters, T=t_multi,
                             multistep=False)
        fps_t_ms = measure(batch=batch_multi, iters=iters, T=t_multi,
                           multistep=True)
        # T=1 at the SAME frames-in-flight (B = batch_multi·T): the fair
        # per-frame baseline for the multistep path — the chip's throughput
        # falls off below the headline batch (measured: 715 f/s at B=128 vs
        # 524 at B=80), and that batch-scaling effect is not a property of
        # the temporal path
        fps_t1_matched = measure(batch=batch_multi * t_multi, iters=iters)
    except Exception as e:
        print(f"# T>1 measurement failed: {e!r}", file=sys.stderr)

    baseline = None
    base_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("frames_per_sec")

    # absolute utilization next to the throughput ratio, in BOTH FLOP
    # conventions (benchmarks/profile_train_step.json defines them):
    # mfu = ALGORITHMIC FLOPs (dense composite math, stable across
    # execution-form changes) / peak; executed_utilization = XLA cost
    # analysis of the shipped program / peak
    mfu = tflops = exec_util = None
    prof = os.path.join(os.path.dirname(__file__), "benchmarks",
                        "profile_train_step.json")
    if os.path.exists(prof):
        with open(prof) as f:
            p = json.load(f)
        peak = p.get("peak_bf16_tflops")
        alg_per_frame = p.get("analytic_train_flops", 0) / p["batch"]
        exec_per_frame = p["xla_cost_analysis"].get("flops", 0) / p["batch"]
        if alg_per_frame and peak:
            tflops = round(fps * alg_per_frame / 1e12, 1)
            mfu = round(tflops / peak, 4)
        if exec_per_frame and peak:
            exec_util = round(fps * exec_per_frame / 1e12 / peak, 4)

    print(json.dumps({
        "metric": "event frames/sec/chip (StereoSpike 260x346 train step, fwd+bwd+adam)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
        "t1_scan_fps": round(fps, 2),
        f"t{t_multi}_scan_fps": round(fps_t_scan, 2) if fps_t_scan else None,
        f"t{t_multi}_multistep_fps": round(fps_t_ms, 2) if fps_t_ms else None,
        "multistep_speedup": (round(fps_t_ms / fps_t_scan, 3)
                              if fps_t_scan and fps_t_ms else None),
        "t1_matched_batch_fps": (round(fps_t1_matched, 2)
                                 if fps_t1_matched else None),
        "multistep_vs_matched_t1": (round(fps_t_ms / fps_t1_matched, 3)
                                    if fps_t_ms and fps_t1_matched else None),
        "sustained_tflops": tflops,
        "mfu": mfu,
        "mfu_convention": ("algorithmic-FLOPs/peak-bf16; see "
                           "benchmarks/profile_train_step.json"
                           if mfu is not None else None),
        "executed_utilization": exec_util,
    }))


if __name__ == "__main__":
    main()
