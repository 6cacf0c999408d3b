"""Subprocess worker for the real 2-process multi-host integration test.

Launched by tests/test_multihost.py as ``python tests/multihost_worker.py
--pid {0,1} ...``: each process initializes ``jax.distributed`` on the CPU
backend (1 local device → a 2-device GLOBAL mesh spanning both processes,
gloo collectives) and runs the PRODUCTION ``train_loop`` — the code path
VERDICT r4 flagged as reviewed-but-never-executed under a real second
process: process-sharded batch iteration, ``make_array_from_process_local_data``
batch assembly (parallel/mesh.py::shard_batch), the GSPMD gradient
all-reduce, lead-process-gated checkpoint/logging, and ``_preempt_sync``'s
cross-host SIGTERM OR-reduction (train/loop.py).

Scenarios:
- ``train``: run N epochs on the seed-deterministic synthetic fixture
  (identical on both hosts), dump this process's final in-memory params to
  ``out_{pid}.npz``. The parent asserts host0 == host1 bitwise (the
  all-reduce keeps replicas in lockstep) and both ≈ a single-process run
  at the equivalent global batch (per-host batches are disjoint strides of
  one shuffled order, so the global step is a within-batch permutation of
  the single-process step — gradient-identical up to reduction order).
- ``preempt``: run many epochs; the parent SIGTERMs ONE process mid-run.
  ``_preempt_sync`` must OR-reduce the flag so BOTH hosts leave the step
  loop at the same lockstep boundary; each process reports its exit step
  in ``out_{pid}.json`` and the parent asserts they match and that the
  lead wrote a resumable checkpoint at that exact point.
"""

import argparse
import hashlib
import json
import os
import sys


def _cache_dir() -> str:
    """Same per-CPU-flavor persistent cache as tests/conftest.py (see its
    docstring for why the cache must be keyed by CPU features)."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/tmp/stereospike_tpu_jax_cache_{tag}"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, default=2)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--scenario", choices=("train", "preempt"), required=True)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    a = p.parse_args()

    # CPU backend with ONE local device per process (the parent strips the
    # 8-virtual-device XLA_FLAGS the test suite runs under); the config
    # update — not the env var — is what overrides the tunnel backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(f"localhost:{a.port}",
                               num_processes=a.nproc, process_id=a.pid)
    assert jax.process_count() == a.nproc, jax.process_count()
    assert len(jax.devices()) == a.nproc, jax.devices()

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import train_loop

    cfg = TrainConfig(
        model="stereospike",
        in_hw=(48, 64),
        batch_size=a.batch_size,       # PER-HOST batch
        epochs=a.epochs,
        seed=7,
        synth_frames=30,
        synth_events=4000,
        # the equivalence scenario must be augmentation-free (the aug PRNG
        # folds in process_index, deliberately decorrelating hosts) and
        # exact-upload; the preemption scenario turns both on to run the
        # host-mirror-swap + wire-packing paths under a real second process
        augment=(a.scenario == "preempt"),
        pack_io=(a.scenario == "preempt"),
        compute_dtype="float32",
        tensorboard=False,
        checkpoint_dir=os.path.join(a.workdir, "ckpt"),
        learning_rate=1e-3,
    )
    # both hosts build the fixture from the same seed → identical datasets
    summary = train_loop(cfg, synthetic=True, return_state=True)
    state = summary.pop("state")

    leaves = jax.tree_util.tree_leaves_with_path(jax.device_get(state.params))
    arrays = {jax.tree_util.keystr(path): np.asarray(v)
              for path, v in leaves}
    np.savez(os.path.join(a.workdir, f"out_{a.pid}.npz"), **arrays)
    with open(os.path.join(a.workdir, f"out_{a.pid}.json"), "w") as f:
        json.dump({"pid": a.pid, "step": int(state.step),
                   "epoch": int(state.epoch),
                   "preempted": bool(summary.get("preempted", False)),
                   "summary": {k: v for k, v in summary.items()
                               if isinstance(v, (int, float, str, bool))}},
                  f)
    print(f"worker {a.pid} done: step={int(state.step)} "
          f"preempted={summary.get('preempted', False)}", flush=True)


if __name__ == "__main__":
    main()
