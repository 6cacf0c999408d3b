#!/usr/bin/env python
"""Measure the conv-form pred1 head (nn/layers._upsample_conv_1out_s2d_conv)
against the selection form on the real chip.

The selection form (`_upsample_conv_1out_s2d`) evaluates the head as two
joint-contraction GEMMs whose selection operands carry ~190 GFLOP (k3 head) of 0/1
arithmetic — the per-site table shows it at 5.3/11.7 ms (fwd / fwd+bwd) and
~1.7 "useful" TFLOP/s. The conv form assembles the near-identity nearest
upsample as a concat of slices in s2d layout and runs ONE 2×2 s2d conv
[4C → 4] (~12 GFLOP). Isolated site timings (interleaved repeats) plus the
full production train step with ``pred_s2d_conv`` on/off.

Writes ``benchmarks/pred_head_site.json``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stereospike_tpu_xla"))

B = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def timeit(fn, *args, iters=ITERS):
    for _ in range(3):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 128))))
    print(f"probe ok in {time.perf_counter() - t0:.1f}s", flush=True)

    from stereospike_tpu.nn.layers import (
        _upsample_conv_1out_s2d,
        _upsample_conv_1out_s2d_conv,
    )

    key = jax.random.PRNGKey(0)
    med = lambda v: sorted(v)[len(v) // 2]
    report = {"batch": B, "iters": ITERS, "repeats": REPEATS,
              "device_kind": jax.devices()[0].device_kind}

    # the production pred1 site: s2d level-0 input [B, 130, 173, 128]
    h2, w2, c = 130, 173, 32
    tgt = (260, 346)
    x = jax.random.normal(key, (B, h2, w2, 4 * c), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, 1), jnp.bfloat16)
    b = jnp.zeros((1,), jnp.bfloat16)

    fns = {}
    for name, fn in (("selection", _upsample_conv_1out_s2d),
                     ("conv_form", _upsample_conv_1out_s2d_conv)):
        fns[name] = {
            "fwd": jax.jit(lambda x, w, b, fn=fn: jnp.sum(
                jnp.square(fn(x, w, b, tgt).astype(jnp.float32)))),
            "fwd_bwd": jax.jit(jax.grad(lambda x, w, b, fn=fn: jnp.sum(
                jnp.square(fn(x, w, b, tgt).astype(jnp.float32))),
                argnums=(0, 1))),
        }
    iso = {n: {"fwd_ms": [], "fwd_bwd_ms": []} for n in fns}
    for _ in range(REPEATS):
        for n in fns:
            iso[n]["fwd_ms"].append(
                round(timeit(fns[n]["fwd"], x, w, b) * 1e3, 3))
            iso[n]["fwd_bwd_ms"].append(
                round(timeit(fns[n]["fwd_bwd"], x, w, b) * 1e3, 3))
    report["pred1_isolated"] = iso
    report["fwd_speedup_median"] = round(
        med(iso["selection"]["fwd_ms"]) / med(iso["conv_form"]["fwd_ms"]), 3)
    report["fwd_bwd_speedup_median"] = round(
        med(iso["selection"]["fwd_bwd_ms"])
        / med(iso["conv_form"]["fwd_bwd_ms"]), 3)
    print("isolated:", json.dumps(iso), flush=True)
    print("medians: fwd", report["fwd_speedup_median"],
          "fwd+bwd", report["fwd_bwd_speedup_median"], flush=True)

    # full production train step, pred_s2d_conv on/off
    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    def make_step(pred_s2d_conv):
        cfg = stereospike(pred_s2d_conv=pred_s2d_conv)
        params = init_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(2e-4)
        state = create_train_state(params, tx, jax.random.PRNGKey(1))
        data = synthetic_batch(jax.random.PRNGKey(3), batch=B,
                               in_hw=cfg.in_hw, T=1)
        step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                       compute_dtype=jnp.bfloat16),
                       donate_argnums=(0,))

        def run(iters):
            nonlocal state
            s = state
            for _ in range(3):
                s, m = step(s, data)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                s, m = step(s, data)
            float(m["loss"])
            state = s
            return B * iters / (time.perf_counter() - t0)

        return run

    runners = {"off": make_step(False), "on": make_step(True)}
    fps = {n: [] for n in runners}
    for _ in range(REPEATS):
        for n, run in runners.items():
            fps[n].append(round(run(12), 1))
    report["train_step_fps"] = fps
    report["step_on_over_off_median"] = round(
        med(fps["on"]) / med(fps["off"]), 4)
    print("train step fps:", json.dumps(fps), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pred_head_site.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
