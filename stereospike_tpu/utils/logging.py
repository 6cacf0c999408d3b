"""Metrics/logging sinks.

The reference logs to plain text + TensorBoard scalars (``train.py:135-173,
272-273,344-345``). Here: structured JSONL (machine-readable, the primary
sink), a human-readable text log, and console — TensorBoard isn't available
in this image; JSONL covers the same scalars and is trivially plottable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only JSONL + text logger with epoch summaries."""

    def __init__(self, log_dir: str, name: str = "training",
                 echo: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self.text_path = os.path.join(log_dir, f"{name}_logs.txt")
        self.echo = echo
        self._jsonl = open(self.jsonl_path, "a")
        self._text = open(self.text_path, "a")

    def log(self, scalars: Dict, *, step: Optional[int] = None,
            epoch: Optional[int] = None) -> None:
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
        self._text.write(message.rstrip() + "\n")
        self._text.flush()
        if self.echo:
            print(message, file=sys.stderr)

    def close(self) -> None:
        self._jsonl.close()
        self._text.close()
