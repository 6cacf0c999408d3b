"""Multi-device execution: mesh construction + sharded train/eval steps."""

from stereospike_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_spec,
    replicated_spec,
    shard_batch,
    make_sharded_train_step,
    make_shardmap_train_step,
    make_sharded_eval_step,
    make_sharded_ann_train_step,
    make_sharded_ann_eval_step,
)
