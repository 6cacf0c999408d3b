#!/usr/bin/env python
"""Event-pipeline throughput: per-event Python loop vs native C++ vs device.

The reference's two dataset-build hot spots are pure-Python per-event loops
(rectification ``utils.py:43-48`` and frame cumulation ``utils.py:251-274``,
SURVEY §3.1). This framework replaces them with (a) a fused C++ host op
(``native/host_ops.cpp``) and (b) an on-device gather + scatter-add
(``data/voxelizer.py``). This benchmark measures all three in events/s on
the same synthetic stream — rectification map + 50 ms binning, MVSEC
resolution — and writes ``benchmarks/voxelizer_throughput.json``.

The Python-loop baseline mirrors the reference's algorithm (dict-free,
already favourable to it) on a subsample, then extrapolates.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 260, 346
N_EVENTS = 4_000_000
N_FRAMES = 1
PY_SUBSET = 200_000


def make_events(n, rng):
    return np.stack([
        rng.integers(0, W, n).astype(np.float32),
        rng.integers(0, H, n).astype(np.float32),
        np.sort(rng.uniform(0.0, 0.05, n)).astype(np.float32),
        rng.choice([0.0, 1.0], n).astype(np.float32),
    ], axis=1)


def python_reference_loop(events, x_map, y_map, t0, dt):
    """The reference's per-event rectify (utils.py:43-48) + cumulate
    (utils.py:265-274) semantics as a plain Python loop."""
    frames = np.zeros((N_FRAMES, H, W, 2), np.float32)
    for ev in events:
        x, y, t, p = int(ev[0]), int(ev[1]), float(ev[2]), int(ev[3])
        if not (0 <= x < W and 0 <= y < H):
            continue
        xr, yr = int(x_map[y, x]), int(y_map[y, x])
        if not (0 <= xr < W and 0 <= yr < H):
            continue
        f = int((t - t0) / dt)
        if 0 <= f < N_FRAMES:
            frames[f, yr, xr, 0 if p > 0 else 1] += 1
    return frames


def main():
    from stereospike_tpu.native import rectify_bin_events

    rng = np.random.default_rng(0)
    events = make_events(N_EVENTS, rng)
    # identity-ish rectification maps with a small warp
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    x_map = np.clip(xx + np.sin(yy / 37.0), 0, W - 1).astype(np.float32)
    y_map = np.clip(yy + np.cos(xx / 53.0), 0, H - 1).astype(np.float32)
    dt = 0.05 / N_FRAMES

    # 1. per-event Python loop (reference algorithm) on a subsample
    sub = events[:PY_SUBSET]
    t0 = time.perf_counter()
    f_py = python_reference_loop(sub, x_map, y_map, 0.0, dt)
    t_py = time.perf_counter() - t0
    py_eps = PY_SUBSET / t_py

    # 2. fused native C++ host op
    for _ in range(2):  # warm the library load
        f_cpp = rectify_bin_events(events, N_FRAMES, 0.0, dt,
                                   x_map=x_map, y_map=y_map,
                                   height=H, width=W)
    t0 = time.perf_counter()
    f_cpp = rectify_bin_events(events, N_FRAMES, 0.0, dt,
                               x_map=x_map, y_map=y_map, height=H, width=W)
    t_cpp = time.perf_counter() - t0
    cpp_eps = N_EVENTS / t_cpp

    # 3. on-device gather + scatter-add (jitted, steady state)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stereospike_tpu_xla"))
    from stereospike_tpu.data.voxelizer import events_to_frames, rectify_events

    xm, ym = jnp.asarray(x_map), jnp.asarray(y_map)

    @jax.jit
    def device_vox(ev):
        ev2, valid = rectify_events(ev, xm, ym, width=W, height=H)
        return events_to_frames(ev2, valid, jnp.float32(0.0), jnp.float32(dt),
                                n_frames=N_FRAMES, height=H, width=W)

    dev_ev = jnp.asarray(events)
    f_dev = device_vox(dev_ev)
    float(jnp.asarray(f_dev).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        f_dev = device_vox(dev_ev)
    float(jnp.asarray(f_dev).reshape(-1)[0])
    t_dev = (time.perf_counter() - t0) / 5
    dev_eps = N_EVENTS / t_dev

    # cross-check: all three produce the same histogram on the subsample
    f_cpp_sub = rectify_bin_events(sub, N_FRAMES, 0.0, dt, x_map=x_map,
                                   y_map=y_map, height=H, width=W)
    agree = bool(np.array_equal(f_py, f_cpp_sub))

    report = {
        "n_events": N_EVENTS,
        "resolution": [H, W],
        "backend": jax.default_backend(),
        "python_loop_events_per_s": round(py_eps),
        "native_cpp_events_per_s": round(cpp_eps),
        "device_events_per_s": round(dev_eps),
        "cpp_vs_python": round(cpp_eps / py_eps, 1),
        "device_vs_python": round(dev_eps / py_eps, 1),
        "python_vs_cpp_agree_exactly": agree,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "voxelizer_throughput.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
