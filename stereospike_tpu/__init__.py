"""StereoSpike-TPU: a TPU-native (JAX/XLA/Pallas) event-vision framework.

A from-scratch rebuild of the capabilities of urancon/StereoSpike (spiking
U-Net for dense depth estimation from stereo DVS event streams on MVSEC),
designed TPU-first:

- functional SNN primitives with explicit membrane-potential state and
  ``jax.custom_jvp`` surrogate gradients (replaces SpikingJelly autograd ops)
- Pallas kernels fusing scale + membrane update + threshold/reset
- device-side event voxelizer (rectification gather + segment-sum binning)
  replacing the reference's per-event Python loops
- ``lax.scan`` over timesteps, ``jax.sharding``/``pjit`` data + spatial
  parallelism over a device mesh
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

from stereospike_tpu.snn import surrogate, neurons  # noqa: F401
