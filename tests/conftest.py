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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: U-Net graphs take ~1 min each to compile on
# CPU; caching makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/stereospike_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
