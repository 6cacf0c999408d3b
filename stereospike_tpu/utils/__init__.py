"""Utilities: logging sinks, profiling hooks."""

from stereospike_tpu.utils.logging import MetricsLogger  # noqa: F401
from stereospike_tpu.utils.profiling import (  # noqa: F401
    enable_nan_debugging,
    trace_profile,
)
