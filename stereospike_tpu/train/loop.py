"""Training / evaluation / profiling drivers.

The reference's three entry scripts (train.py, test.py,
calculate_firing_rates.py — SURVEY.md C15/C17/C18) rebuilt as functions over
a :class:`TrainConfig`, sharing one data/model/step assembly. Adds what the
reference lacks: exact full-state resume, JSONL metrics, periodic
checkpoints, synthetic-data mode, and multi-device execution.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stereospike_tpu.data import (
    AugmentConfig,
    augment_batch,
    batches,
    load_mvsec,
    make_mvsec_fixture,
)
from stereospike_tpu.models import factory as model_factory
from stereospike_tpu.models import (
    count_params,
    firing_rates,
    init_params,
)
from stereospike_tpu.models.stereospike import StereoSpikeConfig, TAP_NAMES
from stereospike_tpu.objectives import TotalLossConfig
from stereospike_tpu.parallel import (
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)
from stereospike_tpu.train.checkpoint import (
    has_checkpoint,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from stereospike_tpu.train.config import TrainConfig
from stereospike_tpu.train.state import (
    create_train_state,
    make_optimizer,
    multistep_lr_schedule,
)
from stereospike_tpu.train.steps import make_eval_step, make_train_step
from stereospike_tpu.utils import MetricsLogger, enable_nan_debugging


def build_model_config(cfg: TrainConfig) -> StereoSpikeConfig:
    """Resolve the model factory + input channel count.

    Frames are channel-stacked (train.py:200-218), so
    in_channels = eyes · N_inference · nfpdm · 2.
    """
    fac = getattr(model_factory, cfg.model)
    eyes = 1 if cfg.model == "stereospike_monocular" else 2
    in_ch = eyes * cfg.n_inference * cfg.nfpdm * 2
    kwargs = dict(in_hw=tuple(cfg.in_hw), in_channels=in_ch)
    if cfg.multiply_factor is not None:
        kwargs["multiply_factor"] = cfg.multiply_factor
    if cfg.model != "stereospike":
        kwargs.update(tau=cfg.tau, use_plif=cfg.use_plif)
    return fac(**kwargs)


def _loss_config(cfg: TrainConfig) -> TotalLossConfig:
    return TotalLossConfig(
        alpha=cfg.loss_alpha, scale_weights=tuple(cfg.scale_weights),
        penalize_spikes=cfg.penalize_spikes, beta=cfg.loss_beta)


def _make_data(cfg: TrainConfig, synthetic: bool, tmpdir: Optional[str]):
    """(train_view, val_view, test_view) from MVSEC or a synthetic fixture."""
    if synthetic:
        import tempfile

        root = tmpdir or tempfile.mkdtemp(prefix="stereospike_synth_")
        tables = make_mvsec_fixture(root, hw=tuple(cfg.in_hw), n_depth=16,
                                    n_events=30000, seed=cfg.seed)
        return load_mvsec(root, split="1", tables=tables, hw=tuple(cfg.in_hw),
                          nfpdm=cfg.nfpdm, warmup_chunks=cfg.n_warmup,
                          train_chunks=cfg.n_inference, learn_on=cfg.learn_on)
    return load_mvsec(
        cfg.data_root, scenario=cfg.scenario, split=cfg.split,
        nfpdm=cfg.nfpdm, warmup_chunks=cfg.n_warmup,
        train_chunks=cfg.n_inference, learn_on=cfg.learn_on,
        normalize=cfg.normalize, hw=tuple(cfg.in_hw))


def _compute_dtype(cfg: TrainConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _device_setup(cfg: TrainConfig):
    n = len(jax.devices())
    if n <= 1:
        return None
    if cfg.mesh_shape:
        return make_mesh(tuple(cfg.mesh_shape))
    # auto data-parallel mesh only when the batch divides cleanly; otherwise
    # stay single-device rather than failing the device_put
    if cfg.batch_size % n == 0:
        return make_mesh((n, 1))
    return None


def train_loop(
    cfg: TrainConfig,
    *,
    synthetic: bool = False,
    max_steps: Optional[int] = None,
    data=None,
) -> Dict:
    """Full training run (reference train.py epoch loop, :180-356).

    Per epoch: shuffled train pass (optional augmentation folded into the
    device program) → validation pass → best-on-val checkpoint + full-state
    ``latest`` for exact resume. Returns a summary dict.
    """
    if cfg.debug_nans:
        enable_nan_debugging(True)

    model_cfg = build_model_config(cfg)
    loss_cfg = _loss_config(cfg)
    binocular = cfg.model != "stereospike_monocular"

    train_view, val_view, _ = data or _make_data(cfg, synthetic, None)
    steps_per_epoch = max(len(train_view) // cfg.batch_size, 1)

    sched = multistep_lr_schedule(cfg.learning_rate, cfg.lr_milestones,
                                  cfg.lr_gamma, steps_per_epoch)
    tx = make_optimizer(sched, cfg.weight_decay)

    rng = jax.random.PRNGKey(cfg.seed)
    k_init, k_state = jax.random.split(rng)
    params = init_params(k_init, model_cfg)
    state = create_train_state(params, tx, k_state)

    if cfg.resume and has_checkpoint(cfg.checkpoint_dir):
        state = restore_checkpoint(cfg.checkpoint_dir, state)

    dtype = _compute_dtype(cfg)
    mesh = _device_setup(cfg)
    train_step = make_train_step(model_cfg, loss_cfg, tx,
                                 learn_on=cfg.learn_on, compute_dtype=dtype)
    eval_step = make_eval_step(model_cfg, loss_cfg, learn_on=cfg.learn_on,
                               compute_dtype=dtype)
    if mesh is not None:
        train_step = make_sharded_train_step(train_step, mesh, spatial=False)
        eval_step = make_sharded_eval_step(eval_step, mesh, spatial=False)
    else:
        train_step = jax.jit(train_step)
        eval_step = jax.jit(eval_step)

    aug_cfg = AugmentConfig(eyes=2 if binocular else 1)
    aug = jax.jit(lambda k, b: augment_batch(k, b, aug_cfg))

    logger = MetricsLogger(cfg.checkpoint_dir)
    logger.text(
        f"model={cfg.model} params={count_params(params):,} "
        f"devices={len(jax.devices())} steps/epoch={steps_per_epoch} "
        f"batch={cfg.batch_size} lr={cfg.learning_rate} dtype={cfg.compute_dtype}")

    def prep(batch: Dict, train: bool = True) -> Dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if cfg.augment and train:
            nonlocal aug_key
            aug_key, k = jax.random.split(aug_key)
            batch = aug(k, batch)
        batch = {k: batch[k] for k in ("chunks", "gt", "mask")}
        if mesh is not None:
            batch = shard_batch(batch, mesh, spatial=False)
        return batch

    aug_key = jax.random.fold_in(rng, 1234)
    start_epoch = int(state.epoch)
    done = False
    summary: Dict = {}

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        train_loss = train_mde = n_steps = 0
        for batch in batches(train_view, cfg.batch_size, shuffle=True,
                             seed=cfg.seed + epoch, binocular=binocular):
            state, metrics = train_step(state, prep(batch))
            train_loss += float(metrics["loss"])
            train_mde += float(metrics["mde"])
            n_steps += 1
            if max_steps is not None and int(state.step) >= max_steps:
                done = True
                break
        train_time = time.time() - t0

        # validation (reference train.py:275-335)
        t0 = time.time()
        val_loss = val_mde = n_val = 0
        for batch in batches(val_view, cfg.batch_size, binocular=binocular,
                             drop_last=False):
            out = eval_step(state.params, prep(batch, train=False))
            val_loss += float(out["loss"])
            val_mde += float(out["mde"])
            n_val += 1
        val_time = time.time() - t0

        state = state._replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
        scalars = {
            "train_loss": train_loss / max(n_steps, 1),
            "train_MDE": train_mde / max(n_steps, 1),
            "val_loss": val_loss / max(n_val, 1),
            "val_MDE": val_mde / max(n_val, 1),
            "lr": float(sched(int(state.step))),
            "train_time_s": train_time,
            "val_time_s": val_time,
        }
        logger.log(scalars, step=int(state.step), epoch=epoch)
        logger.text(
            f"epoch {epoch}: train loss {scalars['train_loss']:.4f} "
            f"MDE {scalars['train_MDE']:.4f} | val loss {scalars['val_loss']:.4f} "
            f"MDE {scalars['val_MDE']:.4f} | {train_time:.1f}s+{val_time:.1f}s")

        is_best = n_val > 0 and scalars["val_MDE"] < float(state.best_metric)
        if is_best:
            state = state._replace(
                best_metric=jnp.asarray(scalars["val_MDE"], jnp.float32))
        tag = (f"epoch_{epoch:04d}"
               if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0
               else None)
        save_checkpoint(cfg.checkpoint_dir, state, best=is_best, tag=tag)
        summary = {"epoch": epoch, **scalars,
                   "best_val_MDE": float(state.best_metric)}
        if done:
            break

    logger.close()
    return summary


def eval_loop(cfg: TrainConfig, *, synthetic: bool = False, data=None,
              which: str = "best.msgpack") -> Dict:
    """Offline test-set evaluation (reference test.py): restore checkpoint,
    accumulate loss + MDE, write ``test_results.txt``."""
    model_cfg = build_model_config(cfg)
    loss_cfg = _loss_config(cfg)
    binocular = cfg.model != "stereospike_monocular"
    if data is None:
        data = _make_data(cfg, synthetic, None)
    test_view = data[2] if isinstance(data, tuple) else data

    params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    if has_checkpoint(cfg.checkpoint_dir, which):
        params = restore_params(cfg.checkpoint_dir, params, which)

    eval_step = jax.jit(make_eval_step(model_cfg, loss_cfg,
                                       learn_on=cfg.learn_on,
                                       compute_dtype=_compute_dtype(cfg)))
    tot_loss = tot_mde = n = 0
    for batch in batches(test_view, cfg.batch_size, binocular=binocular,
                         drop_last=False):
        b = {k: jnp.asarray(batch[k]) for k in ("chunks", "gt", "mask")}
        out = eval_step(params, b)
        tot_loss += float(out["loss"])
        tot_mde += float(out["mde"])
        n += 1
    results = {"test_loss": tot_loss / max(n, 1), "test_MDE": tot_mde / max(n, 1),
               "n_batches": n}
    logger = MetricsLogger(cfg.checkpoint_dir, name="test")
    logger.log(results)
    logger.text(f"Test loss: {results['test_loss']:.4f}  "
                f"Test MDE (m): {results['test_MDE']:.4f}")
    logger.close()
    return results


def firing_rates_loop(cfg: TrainConfig, *, synthetic: bool = False,
                      data=None, which: str = "best.msgpack") -> Dict[str, float]:
    """Spike-density profiling over the test set (reference
    calculate_firing_rates.py): mean per-tap density, written to
    ``firing_rates_on_test.txt``."""
    model_cfg = build_model_config(cfg)
    binocular = cfg.model != "stereospike_monocular"
    if data is None:
        data = _make_data(cfg, synthetic, None)
    test_view = data[2] if isinstance(data, tuple) else data

    params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    if has_checkpoint(cfg.checkpoint_dir, which):
        params = restore_params(cfg.checkpoint_dir, params, which)

    # stack the 14 tap densities on device and fetch once per batch (D2H
    # round-trips through the device tunnel are the expensive part here)
    rate_fn = jax.jit(lambda p, frame: jnp.stack(
        [firing_rates(p, frame, model_cfg)[k] for k in TAP_NAMES]))
    acc = np.zeros(len(TAP_NAMES))
    n = 0
    for batch in batches(test_view, cfg.batch_size, binocular=binocular,
                         drop_last=False):
        frame = jnp.asarray(batch["chunks"])[:, 0]
        acc += np.asarray(rate_fn(params, frame))
        n += 1
    out = {k: float(v) / max(n, 1) for k, v in zip(TAP_NAMES, acc)}

    logger = MetricsLogger(cfg.checkpoint_dir, name="firing_rates")
    logger.log(out)
    enc = np.mean([out[k] for k in TAP_NAMES[:6]])
    dec = np.mean([out[k] for k in TAP_NAMES[6:]])
    for k, v in out.items():
        logger.text(f"{k}: {v:.4f}")
    logger.text(f"mean encoder rate: {enc:.4f}  mean decoder rate: {dec:.4f}")
    logger.close()
    return out
