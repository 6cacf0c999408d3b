"""REAL 2-process multi-host integration tests (VERDICT r4 weak #5).

Everything multi-host elsewhere in the suite runs single-process (the
shard-iterator contract unit tests; lead-gating via monkeypatched
``jax.process_index``). These tests execute the PRODUCTION ``train_loop``
under an actual second process: two subprocesses initialize
``jax.distributed`` on CPU (1 local device each → a 2-device global mesh,
gloo collectives) via ``tests/multihost_worker.py`` and exercise
process-sharded batch iteration, global-batch assembly
(``shard_batch`` → ``make_array_from_process_local_data``), the GSPMD
gradient all-reduce, lead-only checkpoint/logging, and ``_preempt_sync``'s
cross-host SIGTERM OR-reduction (train/loop.py:452-468).

The workers run outside this process's 8-virtual-device conftest
environment (fresh env, 1 CPU device per process); they share the
persistent compile cache, so warm runs are quick.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    # the suite's conftest exported an 8-virtual-device XLA_FLAGS; each
    # worker must see exactly ONE local CPU device
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _launch(workdir: str, scenario: str, epochs: int):
    port = _free_port()
    procs = []
    for i in range(2):
        # stdout MUST go to a file, not a PIPE: nothing drains a pipe
        # until the workers exit, and XLA's stderr chatter (e.g. the
        # CPU AOT-cache machine-feature warnings, ~1 KB each) can fill
        # the 64 KB pipe buffer and block the worker mid-epoch
        logf = open(os.path.join(workdir, f"worker_{i}.log"), "w")
        procs.append((subprocess.Popen(
            [sys.executable, "-u", WORKER, "--pid", str(i),
             "--port", str(port), "--workdir", workdir,
             "--scenario", scenario, "--epochs", str(epochs)],
            cwd=REPO, env=_worker_env(),
            stdout=logf, stderr=subprocess.STDOUT), logf))
    return procs


def _wait(procs, timeout_s: float):
    deadline = time.time() + timeout_s
    for p, _ in procs:
        try:
            p.wait(timeout=max(deadline - time.time(), 1.0))
        except subprocess.TimeoutExpired:
            for q, _ in procs:
                q.kill()
            p.wait()
    outs = []
    for i, (p, logf) in enumerate(procs):
        logf.close()
        with open(logf.name) as f:
            out = f.read()
        outs.append(out)
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n--- output ---\n{out[-4000:]}")
    return outs


def test_two_process_train_matches_single_process(tmp_path):
    """2-host DP train run: both hosts end with BITWISE-identical params
    (the all-reduce keeps replicas in lockstep), and those params match a
    single-process run at the equivalent global batch within float
    tolerance (per-host batches are disjoint strides of one shuffled
    order, so each global step sees the same sample set as the
    single-process step, permuted within the batch — the batch-mean
    gradient is permutation-invariant up to summation order)."""
    workdir = str(tmp_path / "mh")
    os.makedirs(workdir)
    _wait(_launch(workdir, "train", epochs=1), timeout_s=900)

    out0 = dict(np.load(os.path.join(workdir, "out_0.npz")))
    out1 = dict(np.load(os.path.join(workdir, "out_1.npz")))
    assert out0.keys() == out1.keys() and out0
    for k in out0:
        assert np.array_equal(out0[k], out1[k]), (
            f"replicas diverged at {k}: max|Δ|="
            f"{np.abs(out0[k] - out1[k]).max()}")

    with open(os.path.join(workdir, "out_0.json")) as f:
        rep = json.load(f)
    assert rep["epoch"] == 1 and rep["step"] > 0 and not rep["preempted"]

    # single-process equivalent: same seed/fixture, global batch = 2 hosts
    # × per-host 2 (tests/multihost_worker.py cfg); runs in THIS process
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import train_loop

    cfg = TrainConfig(
        model="stereospike", in_hw=(48, 64), batch_size=4, epochs=1,
        seed=7, synth_frames=30, synth_events=4000, augment=False,
        pack_io=False, compute_dtype="float32", tensorboard=False,
        checkpoint_dir=str(tmp_path / "sp"), learning_rate=1e-3)
    state = train_loop(cfg, synthetic=True, return_state=True)["state"]
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(jax.device_get(state.params))
    sp = {jax.tree_util.keystr(path): np.asarray(v) for path, v in leaves}
    assert sp.keys() == out0.keys()
    assert rep["step"] == int(state.step), (rep["step"], int(state.step))
    for k in sp:
        # spiking nets are not bitwise-stable across reduction orders
        # (threshold-boundary spikes flip discretely) — the documented
        # contract is tolerance equivalence, here over a 1-epoch run
        np.testing.assert_allclose(
            out0[k], sp[k], rtol=1e-3, atol=1e-5,
            err_msg=f"2-host vs single-process mismatch at {k}")


def test_preemption_synchronizes_across_processes(tmp_path):
    """SIGTERM ONE process mid-run: ``_preempt_sync`` must OR-reduce the
    flag so BOTH hosts leave the step loop at the same lockstep boundary
    (a host leaving alone deadlocks the other's collectives), and the lead
    must persist a resumable checkpoint at exactly that step."""
    workdir = str(tmp_path / "mh")
    os.makedirs(workdir)
    procs = _launch(workdir, "preempt", epochs=80)

    # wait until training is demonstrably under way (the lead's first
    # epoch summary line), then preempt the NON-lead process — the flag
    # must still reach the lead through the collective
    jsonl = os.path.join(workdir, "ckpt", "training_metrics.jsonl")
    deadline = time.time() + 600
    while time.time() < deadline:
        if any(p.poll() is not None for p, _ in procs):
            break  # a worker died early — _wait below reports its output
        if os.path.exists(jsonl) and os.path.getsize(jsonl) > 0:
            break
        time.sleep(1.0)
    else:
        for p, _ in procs:
            p.kill()
        raise AssertionError("no epoch completed within 600 s")
    procs[1][0].send_signal(signal.SIGTERM)
    _wait(procs, timeout_s=600)

    reps = []
    for i in (0, 1):
        with open(os.path.join(workdir, f"out_{i}.json")) as f:
            reps.append(json.load(f))
    assert all(r["preempted"] for r in reps), reps
    # the OR-reduction runs every 16 lockstep steps — both hosts must
    # break at the SAME boundary
    assert reps[0]["step"] == reps[1]["step"], reps
    assert reps[0]["step"] % 16 == 0, reps

    with open(os.path.join(workdir, "ckpt", "checkpoint_meta.json")) as f:
        meta = json.load(f)
    assert meta["step"] == reps[0]["step"], (meta, reps)
    assert "epoch_step_offset" in meta
    assert os.path.exists(os.path.join(workdir, "ckpt", "latest.msgpack"))
