"""Data pipeline: device-side voxelizer, MVSEC/DENSE loaders, augmentation,
synthetic fixtures."""

from stereospike_tpu.data.synthetic import synthetic_batch, synthetic_stream  # noqa: F401
from stereospike_tpu.data.voxelizer import (  # noqa: F401
    events_to_frames,
    rectify_events,
    voxelize_sequence,
)
from stereospike_tpu.data.mvsec import (  # noqa: F401
    MvsecSequence,
    MvsecView,
    batches,
    load_mvsec,
    load_sequence,
    load_split_tables,
)
from stereospike_tpu.data.dense import DenseDataset, dense_batches, load_dense  # noqa: F401
from stereospike_tpu.data.augmentation import (  # noqa: F401
    AugmentConfig,
    augment_batch,
    time_mirror_flags,
)
from stereospike_tpu.data.fixtures import make_dense_fixture, make_mvsec_fixture  # noqa: F401
