#!/usr/bin/env python
"""Settle the deconv3 polyphase question (round 4, second session).

The committed ``pallas_poly_deconv.json`` carries two runs of the inner-site
table that disagree on deconv3: 0.959× fwd+bwd in the first run, 1.245× in
the end-of-round re-run (deconv2/deconv4 were stable across both). This
script decides it with interleaved repeats — isolated site timings
(composite vs polyphase, fwd and fwd+bwd, 3 alternating repeats each) AND
the number that actually matters: the full production train step
(fwd+bwd+adam, B=128 bf16) with ``poly_deconv`` ∈ {False, (3,), True}.

Writes ``benchmarks/poly_inner_site.json``; the shipped default follows the
whole-step verdict.
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
    # tunnel probe before committing to long work (CLAUDE.md)
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 128))))
    print(f"probe ok in {time.perf_counter() - t0:.1f}s", flush=True)

    from stereospike_tpu.nn.layers import upsample_conv
    from stereospike_tpu.nn.poly_route import upsample_conv_poly

    key = jax.random.PRNGKey(0)
    report = {"batch": B, "iters": ITERS, "repeats": REPEATS,
              "device_kind": jax.devices()[0].device_kind}

    # ---- deconv3 isolated (33×44 → 65×87, 256→128), interleaved repeats
    hw_in, tgt, ci, co = (33, 44), (65, 87), 256, 128
    x = jax.random.normal(key, (B,) + hw_in + (ci,), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (5, 5, ci, co), jnp.bfloat16)

    fns = {}
    for name, fn in (("composite", upsample_conv),
                     ("polyphase", upsample_conv_poly)):
        fns[name] = {
            "fwd": jax.jit(lambda x, w, fn=fn: jnp.sum(
                jnp.square(fn(x, w, target_hw=tgt).astype(jnp.float32)))),
            "fwd_bwd": jax.jit(jax.grad(lambda x, w, fn=fn: jnp.sum(
                jnp.square(fn(x, w, target_hw=tgt).astype(jnp.float32))),
                argnums=(0, 1))),
        }
    iso = {n: {"fwd_ms": [], "fwd_bwd_ms": []} for n in fns}
    for r in range(REPEATS):
        for n in fns:
            iso[n]["fwd_ms"].append(round(timeit(fns[n]["fwd"], x, w) * 1e3, 3))
            iso[n]["fwd_bwd_ms"].append(
                round(timeit(fns[n]["fwd_bwd"], x, w) * 1e3, 3))
    report["deconv3_isolated"] = iso
    med = lambda v: sorted(v)[len(v) // 2]
    report["deconv3_fwd_speedup_median"] = round(
        med(iso["composite"]["fwd_ms"]) / med(iso["polyphase"]["fwd_ms"]), 3)
    report["deconv3_fwd_bwd_speedup_median"] = round(
        med(iso["composite"]["fwd_bwd_ms"])
        / med(iso["polyphase"]["fwd_bwd_ms"]), 3)
    print("isolated:", json.dumps(iso), flush=True)
    print("medians: fwd", report["deconv3_fwd_speedup_median"],
          "fwd+bwd", report["deconv3_fwd_bwd_speedup_median"], flush=True)

    # ---- the number that matters: full production train step
    import dataclasses

    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    def make_step(poly_deconv):
        cfg = stereospike(poly_deconv=poly_deconv)
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

    runners = {"off": make_step(False), "deconv3": make_step((3,)),
               "all": make_step(True)}
    fps = {n: [] for n in runners}
    for r in range(REPEATS):
        for n, run in runners.items():
            fps[n].append(round(run(12), 1))
    report["train_step_fps"] = fps
    report["step_deconv3_over_off_median"] = round(
        med(fps["deconv3"]) / med(fps["off"]), 4)
    report["step_all_over_off_median"] = round(
        med(fps["all"]) / med(fps["off"]), 4)
    print("train step fps:", json.dumps(fps), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "poly_inner_site.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
