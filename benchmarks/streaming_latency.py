#!/usr/bin/env python
"""Streaming-inference latency on one TPU chip.

Measures steady-state end-to-end latency per 50 ms event window through
``stereospike_tpu.streaming.StreamingEvaluator`` (host ring buffer → pad →
H2D → on-device rectify+voxelize → stateful forward → D2H depth map) for
the flagship binocular StereoSpike at 260×346 — the event-camera serving
story (ROADMAP §5). Real-time budget: one window every 50 ms (20 Hz GT
cadence, reference ``utils.py:6-11``).

Writes ``benchmarks/streaming_latency.json``.
"""

import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))


def main(n_windows: int = 50, events_per_window: int = 30000) -> dict:
    from stereospike_tpu.models import init_params, stereospike_tempo
    from stereospike_tpu.streaming import StreamingEvaluator

    cfg = stereospike_tempo()
    params = init_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.in_hw
    rng = np.random.default_rng(0)

    def window(seed):
        r = np.random.default_rng(seed)
        n = events_per_window
        return {
            eye: np.stack([
                r.integers(0, hw[1], n).astype(np.float32),
                r.integers(0, hw[0], n).astype(np.float32),
                np.sort(r.uniform(0, 0.05, n)).astype(np.float32),
                r.choice([0.0, 1.0], n).astype(np.float32),
            ], axis=1)
            for eye in ("left", "right")
        }

    ev = StreamingEvaluator(params, cfg, block=1 << 16,
                            reset_each_window=False)
    # warmup = first compile + first D2H
    for i in range(3):
        d = ev.push(window(i))
    assert np.isfinite(d).all()

    lat = []
    for i in range(n_windows):
        w = window(100 + i)
        t0 = time.perf_counter()
        d = ev.push(w)  # returns a fetched np array = true sync
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3

    # pipelined mode: push dispatches window i and fetches the oldest
    # finished depth — the D2H round trip overlaps the in-flight device
    # compute, so the steady-state inter-result interval is what counts
    pip_stats = {}
    for depth_n in (1, 2):
        evp = StreamingEvaluator(params, cfg, block=1 << 16,
                                 reset_each_window=False, pipeline=depth_n)
        for i in range(3 + depth_n):
            evp.push(window(i))
        pip = []
        for i in range(n_windows):
            w = window(100 + i)
            t0 = time.perf_counter()
            d = evp.push(w)
            pip.append(time.perf_counter() - t0)
            assert d is not None
        while evp.flush() is not None:
            pass
        pip_ms = np.asarray(pip) * 1e3
        pip_stats[depth_n] = pip_ms

    pip_ms = min(pip_stats.values(), key=lambda a: float(np.mean(a)))
    best_depth = [k for k, v in pip_stats.items() if v is pip_ms][0]

    # multi-stream batched serving: S cameras per device step — the
    # per-chip throughput mode (amortizes dispatch + lifts B=1 inefficiency)
    import jax.numpy as jnp

    multi_stats = {}
    for S in (4, 8):
        evm = StreamingEvaluator(params, cfg, block=1 << 16,
                                 reset_each_window=False, pipeline=1,
                                 n_streams=S)
        def multi_window(seed):
            w = window(seed)
            return [w for _ in range(S)]
        for i in range(4):
            evm.push(multi_window(i))
        ts = []
        for i in range(20):
            t0 = time.perf_counter()
            d = evm.push(multi_window(100 + i))
            ts.append(time.perf_counter() - t0)
            assert d is not None
        while evm.flush() is not None:
            pass
        per_window = float(np.mean(ts)) * 1e3

        # ON-DEVICE decomposition for S streams (same method as the S=1
        # on_device_step_ms below): chain the jitted S-stream step with
        # state carry and device-resident event blocks, sync once at the
        # end. Each camera receives one depth per step, so a locally-
        # attached chip serves all S cameras in real time iff the chained
        # step is < 50 ms — the end-to-end interval above additionally
        # pays this backend's per-step tunnel H2D/D2H.
        w0 = window(0)
        evs_s = {e: jnp.asarray(
            np.stack([evm._pad(w0[e])[0]] * S)) for e in ("left", "right")}
        vals_s = {e: jnp.asarray(
            np.stack([evm._pad(w0[e])[1]] * S)) for e in ("left", "right")}
        state = evm._init_state()
        depth, state, _ = evm._step(params, state, evs_s, vals_s)  # compile
        np.asarray(depth)
        n_dev = 30
        t0 = time.perf_counter()
        for _ in range(n_dev):
            depth, state, _ = evm._step(params, state, evs_s, vals_s)
        np.asarray(depth)  # one sync for the whole chain
        dev_ms = (time.perf_counter() - t0) / n_dev * 1e3

        multi_stats[S] = {
            "interval_ms_per_step": round(per_window, 3),
            "interval_ms_per_stream": round(per_window / S, 3),
            "streams_realtime_capable": bool(per_window < 50.0),
            "on_device_step_ms": round(dev_ms, 3),
            "on_device_ms_per_stream": round(dev_ms / S, 3),
            "device_realtime_capable": bool(dev_ms < 50.0),
        }

    # decompose the floor: fetch round-trip of a fresh tiny device buffer
    # (on the axon tunnel this is ~30-40 ms and dominates; on a
    # locally-attached chip it is microseconds and the pipelined interval
    # collapses to host prep + compute)
    import jax.numpy as jnp
    rt = []
    add_one = jax.jit(lambda x: x + 1.0)
    y = add_one(jnp.zeros(4))
    np.asarray(y)
    for i in range(10):
        y = add_one(y)
        t0 = time.perf_counter()
        np.asarray(y)
        rt.append(time.perf_counter() - t0)
    d2h_ms = float(np.median(rt) * 1e3)

    # ON-DEVICE serving rate: chain the jitted step back-to-back on device
    # (state carry, no per-window H2D/D2H) and sync once — what the same
    # code does on a locally-attached chip, where the tunnel round trips
    # vanish. This is the number that decides device realtime capability.
    evd = StreamingEvaluator(params, cfg, block=1 << 16,
                             reset_each_window=False)
    w0 = window(0)
    evs = {e: jnp.asarray(evd._pad(w0[e])[0])[None] for e in ("left", "right")}
    vals = {e: jnp.asarray(evd._pad(w0[e])[1])[None] for e in ("left", "right")}
    state = evd._state
    depth, state, _ = evd._step(params, state, evs, vals)  # compile
    np.asarray(depth)
    n_dev = 50
    t0 = time.perf_counter()
    for _ in range(n_dev):
        depth, state, _ = evd._step(params, state, evs, vals)
    np.asarray(depth)  # one sync for the whole chain
    on_device_ms = (time.perf_counter() - t0) / n_dev * 1e3

    # H2D upload cost of one window's padded event blocks (both eyes).
    # block_until_ready does not truly sync on this backend (CLAUDE.md);
    # sync by fetching a tiny on-device reduction of the uploaded buffers,
    # then subtract the known D2H round trip.
    tiny_sum = jax.jit(lambda a, b: jnp.sum(a[:8]) + jnp.sum(b[:8]))
    wv = window(199)
    _ = float(tiny_sum(jax.device_put(evd._pad(wv["left"])[0]),
                       jax.device_put(evd._pad(wv["right"])[0])))  # compile
    h2d = []
    for i in range(10):
        wv = window(200 + i)
        b1, b2 = (evd._pad(wv[e])[0] for e in ("left", "right"))
        t0 = time.perf_counter()
        float(tiny_sum(jax.device_put(b1), jax.device_put(b2)))
        h2d.append(time.perf_counter() - t0)
    h2d_ms = max(float(np.median(h2d) * 1e3) - d2h_ms, 0.0)

    report = {
        "backend": jax.default_backend(),
        "resolution": list(hw),
        "events_per_window_per_eye": events_per_window,
        "n_windows": n_windows,
        "latency_ms_mean": round(float(lat_ms.mean()), 3),
        "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 3),
        "latency_ms_p99": round(float(np.percentile(lat_ms, 99)), 3),
        "pipelined_depth": best_depth,
        "pipelined_interval_ms_mean": round(float(pip_ms.mean()), 3),
        "pipelined_interval_ms_p50": round(float(np.percentile(pip_ms, 50)), 3),
        "pipelined_interval_ms_p99": round(float(np.percentile(pip_ms, 99)), 3),
        "pipelined_by_depth_mean_ms": {
            k: round(float(v.mean()), 3) for k, v in pip_stats.items()},
        "multi_stream": multi_stats,
        "realtime_budget_ms": 50.0,
        "realtime_ok": bool(np.percentile(lat_ms, 99) < 50.0),
        "pipelined_realtime_ok": bool(np.percentile(pip_ms, 99) < 50.0),
        # environment decomposition: the chained on-device step rate is
        # what a locally-attached chip serves at (no tunnel round trips);
        # the end-to-end interval above additionally pays this backend's
        # H2D upload + D2H fetch through the axon tunnel per window
        "on_device_step_ms": round(on_device_ms, 3),
        "device_realtime_ok": bool(on_device_ms < 50.0),
        "device_hz": round(1e3 / on_device_ms, 1),
        "h2d_window_ms": round(h2d_ms, 3),
        "d2h_roundtrip_ms": round(d2h_ms, 3),
        "tunnel_overhead_ms": round(h2d_ms + d2h_ms, 3),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "streaming_latency.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
