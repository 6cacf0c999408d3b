#!/usr/bin/env python
"""Example artifact consumer: depth serving with ONLY jax installed.

Build the artifact once where the checkpoint lives::

    python -m stereospike_tpu.cli export-serving --out model.ssx \\
        --checkpoint-dir results/run1 --platforms cpu,tpu

then copy ``model.ssx`` to any machine with jax (no stereospike_tpu, no
torch, no checkpoint) and run this script. Everything — rectification,
voxelization, the stateful spiking U-Net, the weights — is inside the
artifact's serialized StableHLO; this file only pads events to the
manifest's block size and threads the membrane state between windows.

(For the full serving runtime — ring buffers, pipelining, TCP sources,
drop accounting — use ``cli stream --artifact model.ssx`` instead; this
example is the minimal only-jax consumer.)
"""

import argparse
import json
import time
import zipfile

import numpy as np


def load_artifact(path):
    """Standalone loader: manifest + the two jax.export blobs."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("manifest.json"))
        step = jexport.deserialize(z.read("step.bin"))
        init = jexport.deserialize(z.read("init.bin"))
    return meta, step, init


def pad_events(events, block):
    """[N, 4] (x, y, t_rel, p) → ([block, 4] zero-padded, [block] valid)."""
    n = min(len(events), block)
    out = np.zeros((block, 4), np.float32)
    out[:n] = events[-block:]
    valid = np.zeros(block, bool)
    valid[:n] = True
    return out, valid


def synthetic_window(rng, meta, n=5000):
    """Stand-in for a camera driver: one window of random events per eye."""
    h, w = meta["in_hw"]
    evs, valids = {}, {}
    for eye in meta["eyes"]:
        ev = np.empty((n, 4), np.float32)
        ev[:, 0] = rng.integers(0, w, n)
        ev[:, 1] = rng.integers(0, h, n)
        ev[:, 2] = rng.uniform(0.0, meta["window_s"], n)
        ev[:, 3] = rng.integers(0, 2, n)
        e, v = pad_events(ev, meta["block"])
        evs[eye] = e[None]      # [n_streams=1, block, 4]
        valids[eye] = v[None]
    return evs, valids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--n-windows", type=int, default=10)
    args = ap.parse_args()

    meta, step, init = load_artifact(args.artifact)
    print(f"model={meta.get('model')} eyes={meta['eyes']} "
          f"hw={meta['in_hw']} window={meta['window_s'] * 1e3:.0f}ms "
          f"platforms={meta['platforms']}")

    state = init.call()
    rng = np.random.default_rng(0)
    for i in range(args.n_windows):
        evs, valids = synthetic_window(rng, meta)
        t0 = time.perf_counter()
        depth, state, rejected = step.call(state, evs, valids)
        depth = np.asarray(depth)  # forces the fetch = true sync
        dt = (time.perf_counter() - t0) * 1e3
        print(f"window {i}: depth {depth.shape} "
              f"[{depth.min():.2f}, {depth.max():.2f}] "
              f"rejected={int(rejected)} {dt:.1f} ms")


if __name__ == "__main__":
    main()
