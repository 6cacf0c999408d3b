"""Device-mesh parallelism (the capability the reference lacks entirely —
single process on cuda:0, SURVEY.md §2 parallelism census).

Strategy (TPU-idiomatic GSPMD):

- mesh axes ``('data', 'spatial')``: batch sharded over ``data`` (the primary
  axis — a conv U-Net is small, so DP with replicated params is the
  production layout, and gradient all-reduce rides ICI), the H image axis
  optionally sharded over ``spatial`` (the SP analog for resolutions/batches
  too large per chip; XLA inserts halo exchanges for the stride-2 convs).
- params/optimizer state replicated; jit's SPMD partitioner derives every
  collective from these annotations — no hand-written NCCL-style calls.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereospike_tpu.train.state import TrainState


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh; default all devices on 'data'."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "spatial"))


def batch_spec(spatial: bool = True,
               keys: Tuple[str, ...] = ("chunks", "gt", "mask")) -> Dict[str, P]:
    """PartitionSpecs for a training batch (any subset of the canonical
    keys: chunks/warmup [B, T, H, W, C]; gt/mask/init_pots/init_mask
    [B, H, W, 1])."""
    sp = "spatial" if spatial else None
    five_d = P("data", None, sp, None, None)
    four_d = P("data", sp, None, None)
    all_specs = {
        "chunks": five_d,
        "warmup": five_d,
        "gt": four_d,
        "mask": four_d,
        "init_pots": four_d,
        "init_mask": four_d,
    }
    return {k: all_specs[k] for k in keys}


def replicated_spec():
    return P()


def shard_batch(batch: Dict, mesh: Mesh, spatial: bool = True) -> Dict:
    """Place a host batch onto the mesh per :func:`batch_spec`.

    Single-process: plain ``device_put``. Multi-HOST (the mesh spans
    processes): each host holds its own PER-HOST batch (disjoint samples
    from the process-sharded iterator, ``data/mvsec.py::batches``), so the
    values are assembled into the global array with
    ``jax.make_array_from_process_local_data`` — the global batch is the
    concatenation of the hosts' local batches along the data axis.
    (``device_put`` would instead treat each host's value as the full
    global array and asserts when they differ across hosts — pinned by
    tests/test_multihost.py under a real 2-process ``jax.distributed``.)
    """
    spec = batch_spec(spatial, keys=tuple(batch.keys()))
    multihost = len({d.process_index for d in mesh.devices.flat}) > 1
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, spec[k])
        if multihost:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def _state_shardings(mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return TrainState(
        params=rep, opt_state=rep, step=rep, epoch=rep,
        best_metric=rep, rng=rep,
    )


def make_sharded_train_step(step_fn, mesh: Mesh, spatial: bool = True,
                            batch_keys: Tuple[str, ...] = ("chunks", "gt", "mask"),
                            donate: bool = False):
    """jit ``step_fn(state, batch)`` over the mesh: params replicated, batch
    data(+spatial)-sharded. XLA emits the gradient all-reduce (psum over
    'data') from the sharding annotations.

    ``donate=True`` donates the input TrainState so params/optimizer buffers
    update in place — for drivers that only ever thread the returned state
    forward (the production loop). Callers that reuse one state across
    several step functions (tests, the dryrun) must keep the default."""
    spec = batch_spec(spatial, keys=batch_keys)
    batch_sh = {k: NamedSharding(mesh, v) for k, v in spec.items()}
    state_sh = _state_shardings(mesh)
    metrics_sh = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, {"loss": metrics_sh, "mde": metrics_sh}),
        donate_argnums=(0,) if donate else (),
    )


def make_shardmap_train_step(step_fn, mesh: Mesh,
                             batch_keys: Tuple[str, ...] = ("chunks", "gt", "mask")):
    """Explicit-collective data-parallel step via ``jax.shard_map``.

    ``step_fn`` must be built with ``grad_psum_axis='data'`` (the in-step
    ``pmean`` is the hand-written collective; contrast with
    :func:`make_sharded_train_step`, where jit's GSPMD partitioner derives
    the same all-reduce from sharding annotations alone). Both layouts are
    provided because production debugging sometimes wants the collectives
    visible in the program.
    """
    spec = batch_spec(spatial=False, keys=batch_keys)
    state_specs = TrainState(params=P(), opt_state=P(), step=P(),
                             epoch=P(), best_metric=P(), rng=P())
    fn = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_specs, spec),
        out_specs=(state_specs, {"loss": P(), "mde": P()}),
        check_vma=False,  # grads are pmean-replicated inside the body
    )
    return jax.jit(fn)


def make_sharded_eval_step(eval_fn, mesh: Mesh, spatial: bool = True):
    spec = batch_spec(spatial)
    batch_sh = {k: NamedSharding(mesh, v) for k, v in spec.items()}
    rep = NamedSharding(mesh, P())
    out_sh = {"loss": rep, "mde": rep,
              "depth": NamedSharding(mesh, spec["gt"])}
    return jax.jit(eval_fn, in_shardings=(rep, batch_sh), out_shardings=out_sh)


# --------------------------------------------------------------- ANN steps
# The equivalent-ANN baseline (reference ANN_models.py:28-152) carries
# BatchNorm running statistics, which raises the one semantics question DP
# has for this model family: per-replica vs global batch statistics. Under
# GSPMD the answer is free and exact — the batch is sharded by ANNOTATION
# (not shard_map), so `jnp.mean` over the sharded batch/H axes lowers to a
# global reduction (XLA inserts the collective), and BN statistics are
# GLOBAL-batch: data-parallel ANN training is bit-for-tolerance identical
# to single-device (pinned by tests/test_ann_warmup.py), unlike torch
# DDP's default per-replica BatchNorm.

def _ann_state_shardings(mesh: Mesh):
    from stereospike_tpu.train.ann_steps import AnnTrainState

    rep = NamedSharding(mesh, P())
    return AnnTrainState(params=rep, bn_state=rep, opt_state=rep,
                         step=rep, epoch=rep, best_metric=rep)


def make_sharded_ann_train_step(step_fn, mesh: Mesh, spatial: bool = False,
                                donate: bool = False):
    """jit the ANN ``step(state, batch)`` over the mesh: params + BN state
    replicated, batch data(+spatial)-sharded; the BN batch statistics and
    the gradient all-reduce both come out of GSPMD's partitioner."""
    spec = batch_spec(spatial)
    batch_sh = {k: NamedSharding(mesh, v) for k, v in spec.items()}
    state_sh = _ann_state_shardings(mesh)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, {"loss": rep, "mde": rep}),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_ann_eval_step(eval_fn, mesh: Mesh, spatial: bool = False):
    """jit the ANN ``eval(params, bn_state, batch)`` over the mesh."""
    spec = batch_spec(spatial)
    batch_sh = {k: NamedSharding(mesh, v) for k, v in spec.items()}
    rep = NamedSharding(mesh, P())
    out_sh = {"loss": rep, "mde": rep,
              "depth": NamedSharding(mesh, spec["gt"])}
    return jax.jit(eval_fn, in_shardings=(rep, rep, batch_sh),
                   out_shardings=out_sh)
