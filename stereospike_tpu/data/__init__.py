"""Data pipeline: device-side voxelizer, MVSEC/DENSE loaders, augmentation,
synthetic fixtures."""

from stereospike_tpu.data.synthetic import synthetic_batch, synthetic_stream  # noqa: F401
