"""Metrics/logging sinks.

The reference logs to plain text + TensorBoard scalars (``train.py:135-173,
272-273,344-345``). Here: structured JSONL (machine-readable, the primary
sink), a human-readable text log, console, and — when the ``tensorboard``
package is importable — real TensorBoard event files under
``<log_dir>/tb_<name>/``, written with tensorboard's own pure-Python
``EventFileWriter`` (no torch/TF import on the training path). Every float
scalar passed to :meth:`MetricsLogger.log` becomes a TB scalar, a superset
of the reference's four tags.

Multi-host: only the lead process (``jax.process_index() == 0``) writes —
params/metrics are replicated across hosts, so N-host runs would otherwise
interleave N identical lines into the shared log files.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class _TBWriter:
    """Minimal TensorBoard scalar sink on tensorboard's pure-Python event
    writer; ``create`` returns None when the package is absent (the JSONL
    sink is the source of truth either way)."""

    @staticmethod
    def create(log_dir: str) -> Optional["_TBWriter"]:
        try:
            from tensorboard.compat.proto.event_pb2 import Event
            from tensorboard.compat.proto.summary_pb2 import Summary
            from tensorboard.summary.writer.event_file_writer import (
                EventFileWriter,
            )
        except Exception:
            return None
        w = _TBWriter()
        w._Event, w._Summary = Event, Summary
        w._writer = EventFileWriter(log_dir)
        return w

    def scalars(self, scalars: Dict, step: int, wall_time: float) -> None:
        values = [self._Summary.Value(tag=k, simple_value=float(v))
                  for k, v in scalars.items()
                  if isinstance(v, (int, float)) and not isinstance(v, bool)]
        if values:
            self._writer.add_event(self._Event(
                wall_time=wall_time, step=step,
                summary=self._Summary(value=values)))

    def close(self) -> None:
        self._writer.close()


def is_lead_process() -> bool:
    """True when this process should own shared-filesystem side effects
    (checkpoints, logs). Always true single-host; process 0 in a
    ``jax.distributed`` multi-host run."""
    import jax

    return jax.process_index() == 0


class MetricsLogger:
    """Append-only JSONL + text logger with epoch summaries.

    On non-lead processes of a multi-host run every method is a no-op (the
    scalars are replicated; writing them N times interleaves the files)."""

    def __init__(self, log_dir: str, name: str = "training",
                 echo: bool = True, tensorboard: bool = True):
        self.active = is_lead_process()
        self.jsonl_path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self.text_path = os.path.join(log_dir, f"{name}_logs.txt")
        self.tb_dir = os.path.join(log_dir, f"tb_{name}")
        self.echo = echo
        self._tb = None
        self._tb_step = 0
        if self.active:
            os.makedirs(log_dir, exist_ok=True)
            # seed the fallback TB step from the number of records already
            # in the JSONL sink (wall-clock-free run metadata): step-less
            # loggers (eval/firing-rates/stream) re-run into the same dir
            # get distinct, increasing global_steps instead of every run
            # stacking its points at step 0
            if os.path.exists(self.jsonl_path):
                with open(self.jsonl_path) as f:
                    self._tb_step = sum(1 for _ in f)
            self._jsonl = open(self.jsonl_path, "a")
            self._text = open(self.text_path, "a")
            if tensorboard:
                self._tb = _TBWriter.create(self.tb_dir)

    def log(self, scalars: Dict, *, step: Optional[int] = None,
            epoch: Optional[int] = None) -> None:
        if not self.active:
            return
        rec = {"time": time.time()}
        if step is not None:
            rec["step"] = int(step)
        if epoch is not None:
            rec["epoch"] = int(epoch)
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            # global_step: explicit step, else epoch, else a running count
            # (advanced only when actually used — an explicit step must not
            # burn fallback indices)
            if step is not None:
                tb_step = step
            elif epoch is not None:
                tb_step = epoch
            else:
                tb_step = self._tb_step
                self._tb_step += 1
            self._tb.scalars({k: v for k, v in rec.items()
                              if k not in ("time", "step", "epoch")},
                             int(tb_step), rec["time"])

    def text(self, message: str) -> None:
        if not self.active:
            return
        self._text.write(message.rstrip() + "\n")
        self._text.flush()
        if self.echo:
            print(message, file=sys.stderr)

    def close(self) -> None:
        if not self.active:
            return
        self._jsonl.close()
        self._text.close()
        if self._tb is not None:
            self._tb.close()
