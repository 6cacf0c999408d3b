"""Training/eval steps for the equivalent ANN baseline.

The ANN (models/ann.py; reference ``ANN_models.py:28-152``) carries
BatchNorm running statistics alongside its parameters, so it gets its own
train state and step factories; loss/metrics/optimizer recipe are shared
with the SNN path (paper Table 4 compares the two under identical training).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from stereospike_tpu.models.ann import AnnConfig, ann_forward
from stereospike_tpu.objectives.losses import TotalLossConfig, total_loss
from stereospike_tpu.objectives.metrics import convert_to_lin, mean_depth_error


class AnnTrainState(NamedTuple):
    params: Dict
    bn_state: Dict
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray
    best_metric: jnp.ndarray


def create_ann_train_state(params: Dict, bn_state: Dict,
                           tx: optax.GradientTransformation) -> AnnTrainState:
    return AnnTrainState(
        params=params, bn_state=bn_state, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
        best_metric=jnp.asarray(jnp.inf, jnp.float32))


def make_ann_train_step(cfg: AnnConfig, loss_cfg: TotalLossConfig,
                        tx: optax.GradientTransformation, *,
                        learn_on: str = "LIN"):
    """``step(state, batch) -> (state, metrics)``; updates BN stats."""

    def step(state: AnnTrainState, batch: Dict):
        # count frames may arrive uint8-packed (data/mvsec.py::_pack_frames)
        frame = batch["chunks"][:, 0].astype(jnp.float32)

        def loss_fn(params):
            depths, new_bn = ann_forward(params, frame, cfg, state.bn_state,
                                         train=True)
            loss = total_loss(depths, batch["gt"], batch["mask"], None, loss_cfg)
            mde = mean_depth_error(convert_to_lin(depths[0], learn_on),
                                   convert_to_lin(batch["gt"], learn_on),
                                   batch["mask"])
            return loss, (new_bn, mde)

        (loss, (new_bn, mde)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state._replace(params=params, bn_state=new_bn,
                                   opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "mde": mde}

    return step


def make_ann_eval_step(cfg: AnnConfig, loss_cfg: TotalLossConfig, *,
                       learn_on: str = "LIN"):
    """Eval with frozen BN statistics. ``loss``/``mde`` are per-sample means
    over the batch (see ``train.steps.per_sample_eval_stats``); callers
    weight them by the batch's sample count."""
    from stereospike_tpu.train.steps import per_sample_eval_stats

    def step(params: Dict, bn_state: Dict, batch: Dict):
        depths, _ = ann_forward(params,
                                batch["chunks"][:, 0].astype(jnp.float32),
                                cfg, bn_state, train=False)
        loss, mde = per_sample_eval_stats(depths, None, batch["gt"],
                                          batch["mask"], loss_cfg, learn_on)
        return {"loss": loss, "mde": mde, "depth": depths[0]}

    return step
