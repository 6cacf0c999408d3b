"""Metrics/logging sinks.

The reference logs to plain text + TensorBoard scalars (``train.py:135-173,
272-273,344-345``). Here: structured JSONL (machine-readable, the primary
sink), a human-readable text log, and console — TensorBoard isn't available
in this image; JSONL covers the same scalars and is trivially plottable.

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
                 echo: bool = True):
        self.active = is_lead_process()
        self.jsonl_path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self.text_path = os.path.join(log_dir, f"{name}_logs.txt")
        self.echo = echo
        if self.active:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(self.jsonl_path, "a")
            self._text = open(self.text_path, "a")

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
