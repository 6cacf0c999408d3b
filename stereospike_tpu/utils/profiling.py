"""Profiling / debugging hooks.

- :func:`trace_profile` — ``jax.profiler`` trace context writing a
  TensorBoard-compatible trace directory (inspect op-level TPU timelines).
- :func:`enable_nan_debugging` — the framework's NaN tripwire (the closest
  reference analog is its determinism clamp, train.py:42-47; SURVEY §5).

The reference's signature observability feature — per-layer spike-density
profiling — lives on the model itself (``models.stereospike.firing_rates``)
and is driven by the CLI ``firing-rates`` subcommand.
"""

from __future__ import annotations

import contextlib

import jax


def enable_nan_debugging(enable: bool = True) -> None:
    """Make any NaN produced under jit raise immediately (debug mode)."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture a device trace: ``with trace_profile('prof'): step(...)``."""
    with jax.profiler.trace(log_dir):
        yield
