"""Atomic full-state checkpointing.

Upgrades the reference's weights-only ``torch.save`` on best-val
(``train.py:348-352``) to exact preemption-resume: the whole ``TrainState``
(params, optimizer moments, step, epoch, best metric, PRNG key) is
serialized with flax msgpack and written atomically (tmp + rename), keeping
``best.msgpack`` (best-on-val weights, the reference's semantics) alongside
``latest.msgpack`` (resume point).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import jax
from flax import serialization

from stereospike_tpu.train.state import TrainState

BEST = "best.msgpack"
LATEST = "latest.msgpack"
META = "checkpoint_meta.json"


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def save_checkpoint(ckpt_dir: str, state: TrainState, *, best: bool = False,
                    tag: Optional[str] = None,
                    meta_extra: Optional[dict] = None) -> str:
    """Write ``latest`` (always), plus ``best``/periodic ``tag`` snapshots.

    ``meta_extra`` merges additional run facts into ``checkpoint_meta.json``
    (e.g. the steps_per_epoch the LR schedule was built with, so a resume
    with a different batch size keeps the original milestone positions).

    Multi-host: only the lead process writes — the state is replicated, so
    every other host would redundantly pull the full params+Adam pytree
    through its device link and race identical bytes onto the shared
    filesystem. Non-lead calls return the path without touching disk.
    """
    path = os.path.join(ckpt_dir, LATEST)
    if jax.process_index() != 0:
        return path
    state = jax.device_get(state)
    data = serialization.to_bytes(state)
    _atomic_write(path, data)
    if best:
        _atomic_write(os.path.join(ckpt_dir, BEST), data)
    if tag is not None:
        _atomic_write(os.path.join(ckpt_dir, f"{tag}.msgpack"), data)
    meta = {
        "step": int(state.step),
        "epoch": int(state.epoch),
        "best_metric": float(state.best_metric),
        **(meta_extra or {}),
    }
    _atomic_write(os.path.join(ckpt_dir, META),
                  json.dumps(meta, indent=2).encode())
    return path


def load_meta(ckpt_dir: str) -> Optional[dict]:
    """Read ``checkpoint_meta.json`` if present."""
    path = os.path.join(ckpt_dir, META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def restore_checkpoint(ckpt_dir: str, target: TrainState,
                       which: str = LATEST) -> TrainState:
    """Restore into the structure of ``target`` (must match shapes/dtypes)."""
    with open(os.path.join(ckpt_dir, which), "rb") as f:
        return serialization.from_bytes(target, f.read())


def has_checkpoint(ckpt_dir: str, which: str = LATEST) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, which))


def restore_params(ckpt_dir: str, target_params, which: str = BEST):
    """Weights-only restore (the reference's eval path, test.py:84)."""
    with open(os.path.join(ckpt_dir, which), "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(target_params, state_dict["params"])


def restore_fields(ckpt_dir: str, targets: dict, which: str = BEST) -> dict:
    """Restore a subset of checkpoint fields by name (e.g. params +
    bn_state for ANN eval) without needing the optimizer state's structure."""
    with open(os.path.join(ckpt_dir, which), "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    return {k: serialization.from_state_dict(t, state_dict[k])
            for k, t in targets.items()}
