"""Training infrastructure: config, optimizer, train state, steps, loops."""

from stereospike_tpu.train.config import TrainConfig  # noqa: F401
from stereospike_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    multistep_lr_schedule,
)
from stereospike_tpu.train.steps import (  # noqa: F401
    make_train_step,
    make_eval_step,
)
from stereospike_tpu.train.ann_steps import (  # noqa: F401,E402
    AnnTrainState,
    create_ann_train_state,
    make_ann_train_step,
    make_ann_eval_step,
)
