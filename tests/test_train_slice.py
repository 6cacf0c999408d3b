"""End-to-end vertical slice: synthetic events → model → loss → BPTT → Adam.

Also exercises the multi-device path on the virtual 8-CPU mesh: data×spatial
sharded train step (SURVEY.md §4's multi-node test recipe).
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereospike_tpu.data import synthetic_batch
from stereospike_tpu.models import init_params, stereospike_tempo
from stereospike_tpu.objectives import TotalLossConfig
from stereospike_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
from stereospike_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    multistep_lr_schedule,
)

SMALL = dict(in_hw=(64, 88))


def _setup(batch=2, lr=1e-3):
    cfg = stereospike_tempo(**SMALL)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    batch_data = synthetic_batch(jax.random.PRNGKey(2), batch=batch, in_hw=cfg.in_hw)
    return cfg, tx, state, batch_data


def test_train_step_decreases_loss():
    cfg, tx, state, batch = _setup()
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_eval_step_runs():
    cfg, _, state, batch = _setup()
    ev = jax.jit(make_eval_step(cfg, TotalLossConfig()))
    out = ev(state.params, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["depth"].shape == (2, 64, 88, 1)
    assert float(out["mde"]) > 0


def test_train_step_bf16_compute():
    cfg, tx, state, batch = _setup()
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                   compute_dtype=jnp.bfloat16))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # master params stay fp32
    assert state2.params["bottom"]["w"].dtype == jnp.float32


def test_remat_matches_no_remat():
    cfg, tx, state, _ = _setup()
    batch = synthetic_batch(jax.random.PRNGKey(3), batch=1, in_hw=cfg.in_hw, T=3)
    s1 = jax.jit(make_train_step(cfg, TotalLossConfig(), tx, remat=False))
    s2 = jax.jit(make_train_step(cfg, TotalLossConfig(), tx, remat=True))
    _, m1 = s1(state, batch)
    _, m2 = s2(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_lr_schedule_matches_multistep():
    sched = multistep_lr_schedule(2e-4, (8, 42, 60), 0.5, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 2e-4)
    np.testing.assert_allclose(float(sched(79)), 2e-4)      # epoch 7
    np.testing.assert_allclose(float(sched(80)), 1e-4)      # epoch 8 boundary
    np.testing.assert_allclose(float(sched(425)), 5e-5)     # epoch 42+
    np.testing.assert_allclose(float(sched(600)), 2.5e-5)   # epoch 60+


def test_data_parallel_matches_single_device():
    """Batch sharded over an (8,1) 'data' mesh reproduces the single-device
    step (per-sample math is untouched; XLA inserts the gradient psum)."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg, tx, state, _ = _setup(batch=8)
    batch = synthetic_batch(jax.random.PRNGKey(4), batch=8, in_hw=cfg.in_hw)
    step_fn = make_train_step(cfg, TotalLossConfig(), tx)
    mesh = make_mesh((8, 1))
    sharded = shard_batch(batch, mesh, spatial=False)
    step = make_sharded_train_step(step_fn, mesh, spatial=False)
    _, metrics = step(state, sharded)
    _, ref_metrics = jax.jit(step_fn)(state, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["mde"]), float(ref_metrics["mde"]),
                               rtol=1e-5)


def test_spatial_sharded_train_step_runs_deterministically():
    """data×spatial (4,2) mesh: H-axis conv halos via GSPMD. A spiking net is
    NOT bitwise-stable under changed reduction order (threshold-boundary
    spikes flip discretely and amplify), so the contract here is: executes,
    finite, and deterministic across invocations — not equality with the
    unsharded step."""
    assert len(jax.devices()) == 8
    cfg, tx, state, _ = _setup(batch=4)
    mesh = make_mesh((4, 2))
    batch = synthetic_batch(jax.random.PRNGKey(4), batch=4, in_hw=cfg.in_hw)
    sharded = shard_batch(batch, mesh)
    step = make_sharded_train_step(make_train_step(cfg, TotalLossConfig(), tx), mesh)
    state1, metrics1 = step(state, sharded)
    _, metrics2 = step(state, sharded)
    assert np.isfinite(float(metrics1["loss"]))
    assert float(metrics1["loss"]) == float(metrics2["loss"])
    assert int(state1.step) == 1


def test_shardmap_matches_gspmd():
    """Explicit-collective shard_map step == GSPMD-annotated step == single
    device, for pure data parallelism."""
    from stereospike_tpu.parallel import make_shardmap_train_step

    assert len(jax.devices()) == 8
    cfg, tx, state, _ = _setup(batch=8)
    batch = synthetic_batch(jax.random.PRNGKey(4), batch=8, in_hw=cfg.in_hw)
    mesh = make_mesh((8, 1))
    sharded = shard_batch(batch, mesh, spatial=False)

    sm_step = make_shardmap_train_step(
        make_train_step(cfg, TotalLossConfig(), tx, grad_psum_axis="data"), mesh)
    st_sm, m_sm = sm_step(state, sharded)

    ref_step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx))
    st_ref, m_ref = ref_step(state, batch)

    np.testing.assert_allclose(float(m_sm["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_sm["mde"]), float(m_ref["mde"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_sm.params["bottom"]["w"]),
        np.asarray(st_ref.params["bottom"]["w"]), rtol=1e-5, atol=1e-7)


def test_spatial_eval_matches_single_device_tolerance():
    """(4,2) spatial-sharded no-grad eval vs single device. Spiking nets are
    not bitwise-stable across execution layouts (threshold-boundary spikes
    flip discretely), so the documented contract is a 5% relative tolerance
    on the scalar statistics, not exact equality."""
    from stereospike_tpu.parallel import make_sharded_eval_step

    assert len(jax.devices()) == 8
    cfg, _, state, _ = _setup(batch=4)
    batch = synthetic_batch(jax.random.PRNGKey(5), batch=4, in_hw=cfg.in_hw)
    eval_fn = make_eval_step(cfg, TotalLossConfig())
    mesh = make_mesh((4, 2))
    out_sp = make_sharded_eval_step(eval_fn, mesh, spatial=True)(
        state.params, shard_batch(batch, mesh, spatial=True))
    out_ref = jax.jit(eval_fn)(state.params, batch)
    np.testing.assert_allclose(float(out_sp["loss"]), float(out_ref["loss"]),
                               rtol=5e-2)
    np.testing.assert_allclose(float(out_sp["mde"]), float(out_ref["mde"]),
                               rtol=5e-2)


def test_train_loop_uses_spatial_mesh(tmp_path, monkeypatch):
    """--mesh-shape (4,2) must actually shard H in the PRODUCT training path
    (not just the dryrun): spy on the step factories to pin the spatial flag
    through train_loop."""
    import stereospike_tpu.train.loop as L
    from stereospike_tpu.train import TrainConfig

    seen = {}
    orig = L.make_sharded_train_step

    def spy(step_fn, mesh, spatial=True, **kw):
        seen["spatial"] = spatial
        seen["mesh"] = mesh.devices.shape
        return orig(step_fn, mesh, spatial=spatial, **kw)

    monkeypatch.setattr(L, "make_sharded_train_step", spy)
    cfg = TrainConfig(in_hw=(64, 88), batch_size=4, epochs=1,
                      model="stereospike_tempo", mesh_shape=(4, 2),
                      checkpoint_dir=str(tmp_path / "sp"))
    summary = L.train_loop(cfg, synthetic=True, max_steps=1)
    assert seen == {"spatial": True, "mesh": (4, 2)}
    assert np.isfinite(summary["train_loss"])


def test_grad_accumulation_matches_mean_of_microbatch_grads():
    """accum_steps=2 must equal applying the MEAN of the two half-batch
    gradients (the documented data-parallel-averaging semantics)."""
    import optax

    from stereospike_tpu.train.steps import _loss_and_metrics

    cfg, tx, state, batch = _setup(batch=4)
    loss_cfg = TotalLossConfig()

    step_acc = jax.jit(make_train_step(cfg, loss_cfg, tx, accum_steps=2))
    new_state, metrics = step_acc(state, batch)

    # manual: mean of the two microbatch grads, one optimizer update
    def loss_fn(p, mb):
        return _loss_and_metrics(p, mb, cfg, loss_cfg, "LIN", jnp.float32,
                                 False, False)[0]
    halves = jax.tree.map(
        lambda x: x.reshape((2, 2) + tuple(x.shape[1:])), batch)
    g0 = jax.grad(loss_fn)(state.params,
                           jax.tree.map(lambda x: x[0], halves))
    g1 = jax.grad(loss_fn)(state.params,
                           jax.tree.map(lambda x: x[1], halves))
    gm = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    upd, _ = tx.update(gm, state.opt_state, state.params)
    want = optax.apply_updates(state.params, upd)

    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(want)):
        # adam's rsqrt amplifies the scan-order float reassociation on a
        # handful of elements; grads themselves agree to ~1e-7
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-5, atol=2e-4)
    # reported scalars are the microbatch means
    l0 = float(loss_fn(state.params, jax.tree.map(lambda x: x[0], halves)))
    l1 = float(loss_fn(state.params, jax.tree.map(lambda x: x[1], halves)))
    np.testing.assert_allclose(float(metrics["loss"]), (l0 + l1) / 2,
                               rtol=1e-5)


def test_grad_accumulation_metrics_keep_master_precision():
    """At x64 the accumulation scan must carry loss/MDE in f64, not round
    them through an f32 init — the trajectory oracle's whole-step-exact
    contract (steps.py::_to_master) also holds at accum_steps > 1."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg, tx, state, batch = _setup(batch=4)
        to64 = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        state = state._replace(params=to64(state.params),
                               opt_state=jax.tree.map(
                                   lambda x: x.astype(jnp.float64)
                                   if jnp.issubdtype(x.dtype, jnp.floating)
                                   else x, state.opt_state))
        batch = to64(batch)
        step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                       compute_dtype=jnp.float64,
                                       accum_steps=2))
        _, metrics = step(state, batch)
        assert metrics["loss"].dtype == jnp.float64
        assert metrics["mde"].dtype == jnp.float64
    finally:
        jax.config.update("jax_enable_x64", False)


def test_grad_accumulation_rejects_indivisible_batch():
    import pytest

    cfg, tx, state, batch = _setup(batch=3)
    step = make_train_step(cfg, TotalLossConfig(), tx, accum_steps=2)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step)(state, batch)


def test_grad_accumulation_trains_through_loop(tmp_path):
    """accum_steps reaches the driver: one epoch of synthetic training."""
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import train_loop

    cfg = TrainConfig(model="stereospike_tempo", in_hw=(48, 64),
                      batch_size=4, accum_steps=2, epochs=1,
                      checkpoint_dir=str(tmp_path), augment=False)
    out = train_loop(cfg, synthetic=True, max_steps=2)
    assert np.isfinite(out["train_loss"])


def test_grad_accumulation_composes_with_shard_map():
    """accum_steps under shard_map: each shard scans its LOCAL microbatches
    with psum'd per-microbatch statistics. The global microbatch k is the
    union of every shard's local slice k, so the single-device oracle is
    accum over the batch REORDERED to that partition."""
    from stereospike_tpu.parallel import make_shardmap_train_step

    assert len(jax.devices()) == 8
    cfg, tx, state, _ = _setup(batch=16)
    batch = synthetic_batch(jax.random.PRNGKey(5), batch=16, in_hw=cfg.in_hw)
    mesh = make_mesh((8, 1))

    sm_step = make_shardmap_train_step(
        make_train_step(cfg, TotalLossConfig(), tx, grad_psum_axis="data",
                        accum_steps=2), mesh)
    st_sm, m_sm = sm_step(state, shard_batch(batch, mesh, spatial=False))

    # shard k holds samples [2k, 2k+1]; local micro 0/1 = first/second →
    # global micro 0 = even indices, micro 1 = odd indices
    perm = np.array(list(range(0, 16, 2)) + list(range(1, 16, 2)))
    reordered = jax.tree.map(lambda x: x[perm], batch)
    ref_step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                       accum_steps=2))
    st_ref, m_ref = ref_step(state, reordered)

    np.testing.assert_allclose(float(m_sm["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_sm.params["bottom"]["w"]),
        np.asarray(st_ref.params["bottom"]["w"]), rtol=1e-4, atol=1e-6)


def test_prefetch_matches_synchronous(tmp_path):
    """The staged input pipeline (prefetch>0) must be bit-identical to
    synchronous prep: one worker thread preserves the augmentation
    PRNG-split order, so final params, losses, and the checkpoint agree
    exactly — backgrounding is a latency optimization, never a semantics
    change."""
    from stereospike_tpu.train.checkpoint import restore_params
    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import train_loop

    outs, params = [], []
    for depth in (0, 3):
        ckdir = str(tmp_path / f"pf{depth}")
        cfg = TrainConfig(model="stereospike_tempo", in_hw=(48, 64),
                          batch_size=2, epochs=2, prefetch=depth,
                          augment=True, synth_frames=10,
                          checkpoint_dir=ckdir)
        outs.append(train_loop(cfg, synthetic=True))
        tpl = init_params(jax.random.PRNGKey(0),
                          stereospike_tempo(in_hw=(48, 64)))
        params.append(restore_params(ckdir, tpl, "latest.msgpack"))
    assert outs[0]["train_loss"] == outs[1]["train_loss"], outs
    assert outs[0]["val_MDE"] == outs[1]["val_MDE"], outs
    for a, b in zip(jax.tree.leaves(params[0]), jax.tree.leaves(params[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prefetch_early_break_stops_worker(tmp_path):
    """max_steps mid-epoch must close the prefetch worker cleanly (no
    orphan thread holding device buffers) and still report finite stats."""
    import threading

    from stereospike_tpu.train.config import TrainConfig
    from stereospike_tpu.train.loop import train_loop

    cfg = TrainConfig(model="stereospike_tempo", in_hw=(48, 64),
                      batch_size=2, epochs=1, prefetch=2,
                      checkpoint_dir=str(tmp_path))
    out = train_loop(cfg, synthetic=True, max_steps=1)
    assert np.isfinite(out["train_loss"])
    assert not [t for t in threading.enumerate()
                if t.name == "stereospike-prefetch" and t.is_alive()]


def test_grad_accumulation_with_multistep():
    """accum + the layer-major multistep path: the microbatch tree split
    covers the [B, T, ...] chunks axis 0 and the step runs end to end."""
    cfg, tx, state, _ = _setup(batch=4)
    batch = synthetic_batch(jax.random.PRNGKey(6), batch=4, in_hw=cfg.in_hw,
                            T=3)
    step = jax.jit(make_train_step(cfg, TotalLossConfig(), tx,
                                   accum_steps=2, multistep=True))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == int(state.step) + 1  # ONE optimizer update
