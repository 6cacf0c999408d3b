#!/usr/bin/env python
"""Learning-dynamics sanity run on the real chip (reproducible).

Trains the flagship binocular StereoSpike at full 260×346 resolution on a
synthetic event stream (fresh random batches every step — a pure
optimization-dynamics check, no generalization claim), logging loss and MDE
every 20 steps. Regenerates ``benchmarks/convergence_synthetic.json`` and
appends a run summary (wall time, frames/s) as the last record.
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


def main(steps: int = 300, batch: int = 32):
    from stereospike_tpu.data import synthetic_batch
    from stereospike_tpu.models import init_params, stereospike
    from stereospike_tpu.objectives import TotalLossConfig
    from stereospike_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = stereospike()
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(2e-4)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                   compute_dtype=jnp.bfloat16),
                   donate_argnums=(0,))
    # generate each fresh batch ON DEVICE (synthetic_batch is jax-native):
    # host-side generation + H2D of 46 MB/step would dominate the wall time
    gen = jax.jit(lambda key: synthetic_batch(key, batch=batch,
                                              in_hw=cfg.in_hw))

    # warm up outside the timer: first compile + this backend's ~150 s
    # first-D2H stall must not be billed to the training steps
    warm = gen(jax.random.PRNGKey(999))
    state, metrics = step(state, warm)
    float(metrics["loss"])

    records = []
    t0 = time.time()
    for i in range(steps):
        batch_data = gen(jax.random.PRNGKey(1000 + i))
        state, metrics = step(state, batch_data)
        if i % 20 == 0 or i == steps - 1:
            records.append({"step": i,
                            "loss": round(float(metrics["loss"]), 3),
                            "mde_m": round(float(metrics["mde"]), 4)})
            print(records[-1], flush=True)
    wall = time.time() - t0
    records.append({"summary": {"steps": steps, "batch": batch,
                                "wall_s": round(wall, 1),
                                "frames_per_s": round(steps * batch / wall, 1),
                                "backend": jax.default_backend()}})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "convergence_synthetic.json")
    with open(out, "w") as f:
        json.dump(records, f)
    print(f"wall {wall:.1f}s  {steps * batch / wall:.1f} frames/s")


if __name__ == "__main__":
    main()
