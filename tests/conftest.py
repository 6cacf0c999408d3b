"""Test configuration: run everything on a virtual 8-device CPU mesh.

Forcing the host platform with 8 virtual devices lets multi-device
(pjit/shard_map) tests run without TPU hardware — the standard JAX recipe.
Must be set before jax initializes its backends, hence the env mutation at
import time.
"""

import os

# Force CPU even when the environment routes JAX to the real TPU tunnel
# (sitecustomize registers that backend at interpreter start, so the
# JAX_PLATFORMS env var alone is not enough — the config update below is):
# unit tests must be hermetic and able to fan out to 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import hashlib

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def _cpu_cache_dir() -> str:
    """Persistent-cache dir keyed by this host's CPU features.

    XLA:CPU stores AOT-compiled machine code; loading an entry compiled on
    a host with different vector extensions SIGILLs mid-test (observed:
    'Target machine feature +prefer-no-gather is not supported ... could
    lead to execution errors such as SIGILL', then a fatal abort inside a
    cached executable). These containers land on heterogeneous hosts, so
    the cache must be per-CPU-flavor."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/tmp/stereospike_tpu_jax_cache_{tag}"


# Persistent compilation cache: U-Net graphs take ~1 min each to compile on
# CPU; caching makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
