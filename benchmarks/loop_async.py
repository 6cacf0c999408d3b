#!/usr/bin/env python
"""Per-step host sync cost in the training loop, measured on-chip.

Round-3 change: the train/eval loops stopped fetching ``float(loss)`` and
``int(state.step)`` every step and instead keep metrics on device until the
epoch ends (train/loop.py). This measures exactly that difference on the
real backend: the same jitted train step driven (a) with a blocking scalar
fetch per step — every step pays the device tunnel's D2H round trip and the
host cannot prep step k+1 while the chip runs step k — and (b) with
deferred accumulation (one stack+fetch at the end), the async-dispatch
pipeline JAX is designed for.

Writes ``benchmarks/loop_async.json``.
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

B = int(os.environ.get("BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main():
    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (create_train_state, make_optimizer,
                                       make_train_step)

    cfg = stereospike()
    tx = make_optimizer(2e-4)
    state = create_train_state(init_params(jax.random.PRNGKey(0), cfg), tx,
                               jax.random.PRNGKey(1))
    batch = synthetic_batch(jax.random.PRNGKey(2), batch=B, in_hw=cfg.in_hw)
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                   compute_dtype=jnp.bfloat16))

    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss"])

    def blocking():
        # the pre-round-3 loop body: three scalar fetches every step
        # (loss, mde, state.step) — each a full D2H round trip here
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, batch)
            _ = float(m["loss"]) + float(m["mde"]) + int(state.step)
        return (time.perf_counter() - t0) / ITERS * 1e3

    def deferred():
        # the round-3 loop body: metrics parked on device, one final fetch
        nonlocal state
        t0 = time.perf_counter()
        parked = []
        for _ in range(ITERS):
            state, m = step(state, batch)
            parked.append((m["loss"], m["mde"]))
        acc = jnp.sum(jnp.asarray(parked, jnp.float32), axis=0)
        _ = float(acc[0])
        return (time.perf_counter() - t0) / ITERS * 1e3

    # interleave and keep the SECOND pass of each: the first deferred pass
    # still pays dispatch-pipeline warmup, which an a/b single shot would
    # misattribute (measured: deferred 117 -> 60 ms between passes)
    deferred(), blocking()
    deferred_ms, blocking_ms = deferred(), blocking()

    report = {
        "batch": B, "iters": ITERS, "dtype": "bfloat16",
        "device_kind": jax.devices()[0].device_kind,
        "blocking_fetch_ms_per_step": round(blocking_ms, 2),
        "deferred_ms_per_step": round(deferred_ms, 2),
        "sync_overhead_ms_per_step": round(blocking_ms - deferred_ms, 2),
        "speedup": round(blocking_ms / deferred_ms, 3),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "loop_async.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
