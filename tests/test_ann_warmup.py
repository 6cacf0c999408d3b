"""ANN training path + SNN warmup/init-pots options."""

import jax
import jax.numpy as jnp
import numpy as np

from stereospike_tpu.data import synthetic_batch
from stereospike_tpu.models import (
    AnnConfig,
    init_ann_params,
    init_ann_state,
    init_params,
    stereospike_tempo,
)
from stereospike_tpu.objectives import TotalLossConfig
from stereospike_tpu.train import (
    create_ann_train_state,
    create_train_state,
    make_ann_eval_step,
    make_ann_train_step,
    make_optimizer,
    make_train_step,
)

HW = (32, 44)


def test_ann_training_decreases_loss():
    cfg = AnnConfig(in_hw=HW)
    params = init_ann_params(jax.random.PRNGKey(0), cfg)
    bn = init_ann_state(cfg)
    tx = make_optimizer(1e-3)
    state = create_ann_train_state(params, bn, tx)
    batch = synthetic_batch(jax.random.PRNGKey(1), batch=2, in_hw=HW)
    step = jax.jit(make_ann_train_step(cfg, TotalLossConfig(), tx))
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # BN stats moved
    assert not np.allclose(np.asarray(state.bn_state["bn_bottom"]["mean"]), 0.0)
    # eval with frozen stats
    ev = jax.jit(make_ann_eval_step(cfg, TotalLossConfig()))
    out = ev(state.params, state.bn_state, batch)
    assert np.isfinite(float(out["loss"]))


def test_warmup_changes_outputs_for_stateful_model():
    cfg = stereospike_tempo(in_hw=HW)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    batch = synthetic_batch(jax.random.PRNGKey(2), batch=2, in_hw=HW)
    batch["warmup"] = jnp.asarray(
        synthetic_batch(jax.random.PRNGKey(3), batch=2, in_hw=HW)["chunks"])
    s_plain = jax.jit(make_train_step(cfg, TotalLossConfig(), tx))
    s_warm = jax.jit(make_train_step(cfg, TotalLossConfig(), tx, use_warmup=True))
    _, m0 = s_plain(state, {k: batch[k] for k in ("chunks", "gt", "mask")})
    _, m1 = s_warm(state, batch)
    # warmed-up hidden state changes the forward (stateful model)
    assert float(m0["loss"]) != float(m1["loss"])
    assert np.isfinite(float(m1["loss"]))


def test_init_pots_seeding():
    cfg = stereospike_tempo(in_hw=HW)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    batch = synthetic_batch(jax.random.PRNGKey(2), batch=2, in_hw=HW)
    batch["init_pots"] = batch["gt"]
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx, use_init_pots=True))
    _, m = step(state, batch)
    base = jax.jit(make_train_step(cfg, TotalLossConfig(), tx))
    _, m0 = base(state, {k: batch[k] for k in ("chunks", "gt", "mask")})
    # seeding the integrator with the GT prior lowers the initial loss
    assert float(m["loss"]) < float(m0["loss"])
