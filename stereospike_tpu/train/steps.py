"""Jittable train/eval step factories.

One fused XLA program per step: forward (``lax.scan`` over T) → masked
multiscale loss → BPTT grads → Adam update → MDE, mirroring the reference's
epoch-loop body (``train.py:221-257``) but as a single compiled function.

Batch convention (produced by ``stereospike_tpu.data``):

    chunks: [B, T, H, W, C] float — voxelized event frames, frames within a
            50 ms chunk channel-stacked (C = nfpdm·2·eyes; train.py:200-218)
    gt:     [B, H, W, 1] float — label in the learned metric (LIN/LOG/DISP)
    mask:   [B, H, W, 1] bool  — valid-pixel mask (replaces NaN GT)

Mixed precision: with ``compute_dtype='bfloat16'`` the forward runs in bf16
on the MXU (fp32 accumulation), while master params, loss and optimizer
state stay fp32.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from stereospike_tpu.models.stereospike import StereoSpikeConfig, forward_sequence
from stereospike_tpu.objectives.losses import TotalLossConfig, total_loss
from stereospike_tpu.objectives.metrics import convert_to_lin, mean_depth_error
from stereospike_tpu.train.state import TrainState

Array = jax.Array


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _to_master(tree):
    """Cast floating leaves UP to at least fp32 (bf16 activations/grads →
    fp32 master precision) without truncating float64 — the x64
    training-trajectory oracle needs the whole step exact in f64."""
    return jax.tree.map(
        lambda x: x.astype(jnp.promote_types(x.dtype, jnp.float32))
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def per_sample_eval_stats(depths, spikes, gt, mask, loss_cfg: TotalLossConfig,
                          learn_on: str):
    """Per-sample loss/MDE means — the reference's batch_size=1 accumulation
    math (train.py:275-335 / test.py:157-173: every sample's scalar weighs
    equally, regardless of its valid-pixel count or which batch it landed
    in). A batch-pooled masked mean would weight samples by valid pixels and
    couple the scale-invariant quad term across samples; vmapping the loss
    over the batch axis keeps each sample's n and (Σres)²/n² its own.

    Returns ``(loss_mean, mde_mean)`` over the batch; accumulate these
    weighted by the batch's sample count for exact dataset-level statistics
    under ``drop_last=False``.
    """
    def one(dep, spk, g, m):
        dep = [d[None] for d in dep]
        spk = [s[None] for s in spk]
        loss = total_loss(dep, g[None], m[None], spk, loss_cfg)
        mde = mean_depth_error(convert_to_lin(dep[0], learn_on),
                               convert_to_lin(g[None], learn_on), m[None])
        return loss, mde

    losses, mdes = jax.vmap(one)(tuple(depths), tuple(spikes or ()), gt, mask)
    return jnp.mean(losses), jnp.mean(mdes)


def _loss_and_metrics(params, batch: Dict, model_cfg: StereoSpikeConfig,
                      loss_cfg: TotalLossConfig, learn_on: str,
                      compute_dtype, remat: bool, multistep: bool = False,
                      use_warmup: bool = False, use_init_pots: bool = False,
                      axis_name=None, per_sample: bool = False):
    chunks = batch["chunks"].astype(compute_dtype)
    p = _cast_tree(params, compute_dtype) if compute_dtype != jnp.float32 else params
    if multistep:
        from stereospike_tpu.models.multistep import forward_multistep as _fwd

        def fwd(x, st=None):
            return _fwd(p, x, model_cfg, st)
    else:
        def fwd(x, st=None):
            return forward_sequence(p, x, model_cfg, st, remat=remat)

    state0 = None
    if use_warmup and "warmup" in batch:
        # no-grad warmup inference to settle hidden state before the train
        # chunks (the reference's stateful-model recipe, train.py:223-228)
        warm = jax.lax.stop_gradient(batch["warmup"].astype(compute_dtype))
        _, _, state0 = fwd(warm)
        state0 = jax.lax.stop_gradient(state0)
    if use_init_pots and "init_pots" in batch:
        # seed the depth-integrator pool with the prior label
        # (set_init_depths_potentials, SNN_models.py:247-248)
        from stereospike_tpu.models.stereospike import init_state

        if state0 is None:
            state0 = init_state(model_cfg, chunks.shape[0], chunks.dtype)
        state0 = dict(state0)
        state0["Ineurons"] = jax.lax.stop_gradient(
            batch["init_pots"].astype(compute_dtype))

    depths, spikes, _ = fwd(chunks, state0)
    depths = list(_to_master(depths))
    spikes = list(_to_master(spikes))
    gt, mask = batch["gt"], batch["mask"]
    if per_sample:
        loss, mde = per_sample_eval_stats(depths, spikes, gt, mask, loss_cfg,
                                          learn_on)
        return loss, (mde, depths[0])
    loss = total_loss(depths, gt, mask, spikes, loss_cfg, axis_name)
    lin_pred = convert_to_lin(depths[0], learn_on)
    lin_gt = convert_to_lin(gt, learn_on)
    mde = mean_depth_error(lin_pred, lin_gt, mask, axis_name)
    return loss, (mde, depths[0])


def make_train_step(
    model_cfg: StereoSpikeConfig,
    loss_cfg: TotalLossConfig,
    tx: optax.GradientTransformation,
    *,
    learn_on: str = "LIN",
    compute_dtype=jnp.float32,
    remat: bool = False,
    multistep: bool = False,
    use_warmup: bool = False,
    use_init_pots: bool = False,
    grad_psum_axis: Optional[str] = None,
    accum_steps: int = 1,
) -> Callable[[TrainState, Dict], tuple]:
    """Build ``step(state, batch) -> (state, metrics)``.

    ``multistep=True`` uses the layer-major T-step forward
    (models/multistep.py: convs batch over B·T, neuron recurrences run
    statically unrolled in the conv's own layout) — the measured fast path
    for T > 1 (~1.4× the step-major scan).
    ``grad_psum_axis``: inside ``shard_map``, the loss/MDE are computed with
    globally-psum'd sufficient statistics (exactly the single-device math)
    and the gradients are psum'd — the hand-written collective equivalent of
    what jit's SPMD partitioner derives from sharding annotations.
    ``accum_steps > 1``: gradient accumulation — the batch is split into
    that many microbatches, walked by a ``lax.scan`` whose carry holds only
    ONE microbatch's activations plus the fp32 grad accumulator, so the
    effective batch is bounded by HBM at B/accum_steps. Semantics are
    mean-of-microbatch gradients (each microbatch's loss its own pooled
    masked mean) — identical to data-parallel averaging over accum_steps
    shards, not bitwise-identical to the single-pass pooled loss when
    valid-pixel counts differ across microbatches.
    """

    def loss_fn(params, batch):
        return _loss_and_metrics(params, batch, model_cfg, loss_cfg,
                                 learn_on, compute_dtype, remat, multistep,
                                 use_warmup, use_init_pots,
                                 axis_name=grad_psum_axis)

    def grads_and_metrics(params, batch: Dict):
        if accum_steps == 1:
            (loss, (mde, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            return _to_master(grads), loss, mde
        b = batch["gt"].shape[0]
        if b % accum_steps:
            raise ValueError(
                f"batch size {b} is not divisible by "
                f"accum_steps={accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, b // accum_steps)
                                + tuple(x.shape[1:])), batch)

        def body(acc, mb):
            acc_g, acc_l, acc_m = acc
            (l, (m, _)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb)
            g = _to_master(g)
            return (jax.tree.map(jnp.add, acc_g, g),
                    acc_l + l.astype(acc_l.dtype),
                    acc_m + m.astype(acc_m.dtype)), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.promote_types(p.dtype,
                                                           jnp.float32)),
            params)
        # metric carries in master precision too (an f32 init would round
        # the x64 trajectory oracle's f64 per-step losses): the loss dtype
        # is promote(gt, master-cast depths)
        mdtype = jnp.promote_types(
            jnp.promote_types(jnp.result_type(batch["gt"]), compute_dtype),
            jnp.float32)
        (gsum, lsum, msum), _ = jax.lax.scan(
            body, (zeros, jnp.zeros((), mdtype), jnp.zeros((), mdtype)),
            micro)
        inv = 1.0 / accum_steps
        return (jax.tree.map(lambda g: g * inv, gsum),
                lsum * inv, msum * inv)

    def step(state: TrainState, batch: Dict):
        grads, loss, mde = grads_and_metrics(state.params, batch)
        if grad_psum_axis is not None:
            # loss is already global (psum'd statistics); each shard's
            # backward holds only its local data's gradient contribution
            grads = jax.lax.psum(grads, grad_psum_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "mde": mde}

    return step


def make_eval_step(
    model_cfg: StereoSpikeConfig,
    loss_cfg: TotalLossConfig,
    *,
    learn_on: str = "LIN",
    compute_dtype=jnp.float32,
    multistep: bool = False,
) -> Callable[[Dict, Dict], Dict]:
    """Build ``eval_step(params, batch) -> {'loss', 'mde', 'depth'}``
    (the reference's no-grad val/test body, train.py:275-335 / test.py:101-173).

    ``loss``/``mde`` are PER-SAMPLE means over the batch (the reference's
    batch_size=1 accumulation math — see :func:`per_sample_eval_stats`);
    callers accumulate them weighted by the batch's sample count so a short
    final batch under ``drop_last=False`` weighs by its samples, not 1.

    No-grad forward: runs the inference execution profile
    (phase-stacked decoder, ``StereoSpikeConfig.for_inference``)."""
    model_cfg = model_cfg.for_inference()

    def step(params: Dict, batch: Dict):
        loss, (mde, depth) = _loss_and_metrics(
            params, batch, model_cfg, loss_cfg, learn_on, compute_dtype,
            False, multistep, per_sample=True)
        return {"loss": loss, "mde": mde, "depth": depth}

    return step
