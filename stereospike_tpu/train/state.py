"""Train state and optimizer.

Matches the reference's optimization recipe (``train.py:126-128``):
Adam(lr=2e-4, torch defaults) + MultiStepLR(milestones=[8,42,60], gamma=0.5)
stepped per epoch. Unlike the reference (weights-only checkpoint,
``train.py:351``), the full state — params, optimizer moments, step, epoch,
PRNG key — is a single pytree, so preemption-resume is exact (see
``train/checkpoint.py``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Dict
    opt_state: Any
    step: jnp.ndarray       # global optimizer step
    epoch: jnp.ndarray      # epoch counter (drives the LR schedule)
    best_metric: jnp.ndarray  # best val MDE so far (init +inf, SNN_models.py:19)
    rng: jnp.ndarray        # PRNG key for augmentation etc.


def multistep_lr_schedule(base_lr: float, milestones: Sequence[int],
                          gamma: float, steps_per_epoch: int):
    """optax schedule equal to torch MultiStepLR stepped per epoch."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(learning_rate, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam with torch defaults; weight_decay as torch's Adam L2 term
    (added to the gradient before the moment updates, not decoupled)."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def create_train_state(params: Dict, tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        best_metric=jnp.asarray(jnp.inf, jnp.float32),
        rng=rng,
    )
