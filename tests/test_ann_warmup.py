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


def test_ann_data_parallel_matches_single_device():
    """DP ANN over an (8,1) data mesh == single device, INCLUDING the BN
    batch statistics: the batch is sharded by annotation, so GSPMD lowers
    the BN mean/var over the sharded batch axis to a global reduction —
    global-batch BN, not torch-DDP-style per-replica stats."""
    from stereospike_tpu.parallel import (
        make_mesh,
        make_sharded_ann_eval_step,
        make_sharded_ann_train_step,
        shard_batch,
    )

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = AnnConfig(in_hw=HW)
    params = init_ann_params(jax.random.PRNGKey(0), cfg)
    bn = init_ann_state(cfg)
    tx = make_optimizer(1e-3)
    state = create_ann_train_state(params, bn, tx)
    batch = synthetic_batch(jax.random.PRNGKey(1), batch=8, in_hw=HW)

    step_fn = make_ann_train_step(cfg, TotalLossConfig(), tx)
    mesh = make_mesh((8, 1))
    sharded = shard_batch(batch, mesh, spatial=False)
    st_dp, m_dp = make_sharded_ann_train_step(step_fn, mesh)(state, sharded)
    st_ref, m_ref = jax.jit(step_fn)(state, batch)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_dp["mde"]), float(m_ref["mde"]),
                               rtol=1e-5)
    # BN running stats agree → the batch statistics were global
    np.testing.assert_allclose(
        np.asarray(st_dp.bn_state["bn_bottom"]["mean"]),
        np.asarray(st_ref.bn_state["bn_bottom"]["mean"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(st_dp.params["bottom"]["w"]),
        np.asarray(st_ref.params["bottom"]["w"]), rtol=1e-5, atol=1e-7)

    ev_fn = make_ann_eval_step(cfg, TotalLossConfig())
    out_dp = make_sharded_ann_eval_step(ev_fn, mesh)(
        st_dp.params, st_dp.bn_state, sharded)
    out_ref = jax.jit(ev_fn)(st_ref.params, st_ref.bn_state, batch)
    np.testing.assert_allclose(float(out_dp["mde"]), float(out_ref["mde"]),
                               rtol=1e-5)


def test_ann_train_loop_uses_mesh(tmp_path, monkeypatch):
    """--mesh-shape must reach the ANN driver (it silently ran single-device
    before): spy on the sharded-step factory through _ann_train_loop."""
    import stereospike_tpu.parallel as par
    import stereospike_tpu.train.loop as L
    from stereospike_tpu.train import TrainConfig

    seen = {}
    orig = par.make_sharded_ann_train_step

    def spy(step_fn, mesh, spatial=False, **kw):
        seen["spatial"] = spatial
        seen["mesh"] = mesh.devices.shape
        return orig(step_fn, mesh, spatial=spatial, **kw)

    monkeypatch.setattr(par, "make_sharded_ann_train_step", spy)
    cfg = TrainConfig(in_hw=(32, 44), batch_size=8, epochs=1,
                      model="ann_sigmoid", mesh_shape=(8, 1),
                      checkpoint_dir=str(tmp_path / "anndp"))
    summary = L.train_loop(cfg, synthetic=True, max_steps=1)
    assert seen == {"spatial": False, "mesh": (8, 1)}
    assert np.isfinite(summary["train_loss"])
