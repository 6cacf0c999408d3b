"""Training / evaluation / profiling drivers.

The reference's three entry scripts (train.py, test.py,
calculate_firing_rates.py — SURVEY.md C15/C17/C18) rebuilt as functions over
a :class:`TrainConfig`, sharing one data/model/step assembly. Adds what the
reference lacks: exact full-state resume, JSONL metrics, periodic
checkpoints, synthetic-data mode, multi-device execution, and the
layer-major multistep path (``multistep=True``; statically-unrolled
recurrences in the conv's own layout — the measured T>1 fast path).

Every SNN variant plus the equivalent-ANN baselines (reference
``ANN_models.py:28``, paper Table 4) are reachable through ``cfg.model``;
ANN models dispatch to their own loops (they carry BatchNorm state).
"""

from __future__ import annotations

import os
import time
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stereospike_tpu.data import (
    AugmentConfig,
    augment_batch,
    time_mirror_flags,
    batches,
    load_mvsec,
    make_mvsec_fixture,
)
from stereospike_tpu.data.packing import pack_batch_host, unpack_batch_device
from stereospike_tpu.models import factory as model_factory
from stereospike_tpu.models import (
    count_params,
    firing_rates_sequence,
    init_params,
)
from stereospike_tpu.models.ann import AnnConfig, init_ann_params, init_ann_state
from stereospike_tpu.models.stereospike import StereoSpikeConfig, TAP_NAMES
from stereospike_tpu.objectives import TotalLossConfig
from stereospike_tpu.parallel import (
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)
from stereospike_tpu.train.ann_steps import (
    create_ann_train_state,
    make_ann_eval_step,
    make_ann_train_step,
)
from stereospike_tpu.train.checkpoint import (
    has_checkpoint,
    load_meta,
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

# equivalent-ANN baseline activations (reference ANN_models.py:28 default is
# Sigmoid; paper Table 4 compares sigmoid/tanh/leaky_relu)
ANN_MODELS = {
    "ann": "sigmoid",
    "ann_sigmoid": "sigmoid",
    "ann_tanh": "tanh",
    "ann_leaky_relu": "leaky_relu",
    "ann_relu": "relu",
}


def is_ann_model(name: str) -> bool:
    return name in ANN_MODELS


def _in_channels(cfg: TrainConfig) -> int:
    """Per-step channel count: frames are channel-stacked
    (train.py:200-218) with the n_inference chunks spread over n_timesteps
    scan steps, so C = eyes · (N_inference/n_timesteps) · nfpdm · 2."""
    eyes = 1 if cfg.model == "stereospike_monocular" else 2
    if cfg.n_inference % cfg.n_timesteps:
        raise ValueError(
            f"n_timesteps={cfg.n_timesteps} must divide "
            f"n_inference={cfg.n_inference}")
    return eyes * (cfg.n_inference // cfg.n_timesteps) * cfg.nfpdm * 2


def build_model_config(cfg: TrainConfig) -> StereoSpikeConfig:
    """Resolve the SNN model factory + input channel count."""
    fac = getattr(model_factory, cfg.model)
    kwargs = dict(in_hw=tuple(cfg.in_hw), in_channels=_in_channels(cfg))
    if cfg.multiply_factor is not None:
        kwargs["multiply_factor"] = cfg.multiply_factor
    if cfg.heads is not None:
        # paper Table 2: prediction-head subsets; the full-res head must
        # stay (eval MDE is measured on depth1, reference test.py:161-169)
        if 1 not in cfg.heads or not set(cfg.heads) <= {1, 2, 3, 4}:
            raise ValueError(f"heads={cfg.heads} must be a subset of "
                             "{1,2,3,4} containing 1")
        kwargs["heads"] = tuple(sorted(cfg.heads))
    if cfg.model != "stereospike":
        kwargs.update(tau=cfg.tau, use_plif=cfg.use_plif)
    return fac(**kwargs)


def build_ann_config(cfg: TrainConfig) -> AnnConfig:
    """Resolve an equivalent-ANN baseline config from ``cfg.model``."""
    if cfg.n_timesteps != 1:
        # the ANN is stateless (no membrane carry): a T>1 batch would
        # silently train/evaluate on step 0 only — refuse instead
        raise ValueError(
            f"ANN models are single-step (n_timesteps={cfg.n_timesteps}); "
            "channel-stack the chunks (n_timesteps=1) or use an SNN model")
    return AnnConfig(in_channels=_in_channels(cfg), in_hw=tuple(cfg.in_hw),
                     activation=ANN_MODELS[cfg.model])


def _loss_config(cfg: TrainConfig) -> TotalLossConfig:
    return TotalLossConfig(
        alpha=cfg.loss_alpha, scale_weights=tuple(cfg.scale_weights),
        penalize_spikes=cfg.penalize_spikes, beta=cfg.loss_beta)


def _dense_guard(cfg: TrainConfig) -> None:
    """Config constraints of the DENSE dataset (monocular CARLA,
    dense_dataset.py): one 2-channel chunk per depth map, no warmup window,
    no stereo disparity."""
    if cfg.model != "stereospike_monocular":
        raise ValueError(
            "DENSE is a monocular dataset (dense_dataset.py:100: "
            "data_right=None); use model=stereospike_monocular")
    if cfg.n_timesteps != 1 or cfg.n_inference != 1:
        raise ValueError(
            "DENSE emits one chunk per depth map: n_timesteps and "
            "n_inference must both be 1")
    if cfg.use_warmup or cfg.use_init_pots:
        raise ValueError("DENSE samples carry no warmup chunks / init_pots")
    if cfg.learn_on == "DISP":
        raise ValueError("DENSE has no stereo baseline; learn_on must be "
                         "LIN or LOG")


def _make_data(cfg: TrainConfig, synthetic: bool, tmpdir: Optional[str],
               test_only: bool = False):
    """(train_view, val_view, test_view) — or just the test view with
    ``test_only`` (the reference's load_test_only, test.py:64-67: eval must
    not load and voxelize the two multi-GB training sequences)."""
    if cfg.dataset == "dense":
        from stereospike_tpu.data.dense import load_dense, split_dense

        _dense_guard(cfg)
        root = cfg.data_root
        if synthetic:
            import tempfile

            from stereospike_tpu.data.fixtures import make_dense_fixture

            root = tmpdir or tempfile.mkdtemp(prefix="stereospike_dense_")
            make_dense_fixture(root, hw=tuple(cfg.in_hw), n_maps=12,
                               seed=cfg.seed)
        ds = load_dense(root, nfpdm=cfg.nfpdm,
                        take_log=(cfg.learn_on == "LOG"), hw=tuple(cfg.in_hw))
        train, val, test = split_dense(ds)
        return test if test_only else (train, val, test)
    if cfg.dataset != "mvsec":
        raise ValueError(f"unknown dataset {cfg.dataset!r} (mvsec | dense)")
    if synthetic:
        import tempfile

        root = tmpdir or tempfile.mkdtemp(prefix="stereospike_synth_")
        tables = make_mvsec_fixture(root, hw=tuple(cfg.in_hw),
                                    n_depth=cfg.synth_frames,
                                    n_events=cfg.synth_events,
                                    learnable=cfg.synth_learnable,
                                    seed=cfg.seed)
        return load_mvsec(root, split="1", tables=tables, hw=tuple(cfg.in_hw),
                          nfpdm=cfg.nfpdm, warmup_chunks=cfg.n_warmup,
                          train_chunks=cfg.n_inference, learn_on=cfg.learn_on,
                          load_test_only=test_only,
                          event_block_rows=cfg.event_block_rows)
    return load_mvsec(
        cfg.data_root, scenario=cfg.scenario, split=cfg.split,
        nfpdm=cfg.nfpdm, warmup_chunks=cfg.n_warmup,
        train_chunks=cfg.n_inference, learn_on=cfg.learn_on,
        normalize=cfg.normalize, hw=tuple(cfg.in_hw),
        load_test_only=test_only, event_block_rows=cfg.event_block_rows)


def _test_view(cfg: TrainConfig, synthetic: bool, data):
    if data is None:
        return _make_data(cfg, synthetic, None, test_only=True)
    return data[2] if isinstance(data, tuple) else data


def _fetch_sums(stats, width: int = 2) -> np.ndarray:
    """Sum a list of per-step device-scalar tuples in one device op + one
    D2H fetch. The async-dispatch contract of every loop here: metrics stay
    ON DEVICE while iterating (a per-step float() would block the host a
    full tunnel round trip per step and serialize next-batch prep behind
    device compute — measured 3.6×, benchmarks/loop_async.json); this is
    the single deferred fetch at the end."""
    if not stats:
        return np.zeros(width)
    return np.asarray(jnp.sum(jnp.asarray(stats, jnp.float32), axis=0))


def _batch_iter(cfg: TrainConfig, view, shard_over_processes: bool = False,
                **kw):
    """Dataset-dispatching batch iterator: MVSEC views take the canonical
    eye-stacked batcher, DENSE datasets their monocular one. ``kw``:
    shuffle/seed/drop_last only — the dataset-specific layout arguments
    (binocular, n_timesteps, include_warmup) are derived from ``cfg``.

    ``shard_over_processes``: in a multi-HOST run each process takes its
    disjoint stride of the seed-deterministic order (equal step counts —
    required for lockstep collectives); batch_size stays per-host. Train
    only: eval loops accumulate host-locally, so every host evaluates the
    full set (redundant but correct without a cross-host reduction)."""
    if shard_over_processes and jax.process_count() > 1:
        if cfg.dataset == "dense":
            raise NotImplementedError(
                "multi-host data sharding is MVSEC-only for now")
        kw["shard"] = (jax.process_index(), jax.process_count())
    if cfg.dataset == "dense":
        from stereospike_tpu.data.dense import dense_batches

        return dense_batches(view, cfg.batch_size, **kw)
    return batches(view, cfg.batch_size,
                   binocular=cfg.model != "stereospike_monocular",
                   n_timesteps=cfg.n_timesteps,
                   include_warmup=cfg.use_warmup, **kw)


def _compute_dtype(cfg: TrainConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _device_setup(cfg: TrainConfig):
    n = len(jax.devices())
    if n <= 1:
        return None
    if cfg.mesh_shape:
        if cfg.batch_size % cfg.mesh_shape[0]:
            raise ValueError(
                f"batch_size={cfg.batch_size} is not divisible by the "
                f"requested data-parallel mesh axis {cfg.mesh_shape[0]}")
        return make_mesh(tuple(cfg.mesh_shape))
    if cfg.batch_size % n == 0:
        return make_mesh((n, 1))
    key = (cfg.batch_size, n)
    if key not in _WARNED_SINGLE_DEVICE:   # once per (batch_size, n) config
        _WARNED_SINGLE_DEVICE.add(key)
        warnings.warn(
            f"batch_size={cfg.batch_size} does not divide over the {n} "
            "available devices; running SINGLE-device. Set batch_size to a "
            f"multiple of {n} or pass an explicit mesh_shape to parallelize.")
    return None


_WARNED_SINGLE_DEVICE: set = set()


def _upload_augmented(batch: Dict, k, keys, jits, pack: bool = False) -> Dict:
    """Upload + device-augment one training batch, swapping the time-mirror
    on HOST when the train step itself doesn't consume init_pots.

    init_pots/init_mask exist only to feed the time-mirror swap
    (gt<->init_pots, mask<->init_mask) — uploading them costs 36% of a
    default batch's bytes, the single biggest input cost on an
    upload-bound link (benchmarks/production_loop_throughput.json:
    73 MB/s H2D tunnel). Drawing the mirror decisions up front
    (``time_mirror_flags``, the EXACT flags ``augment_batch`` would draw
    from ``k``) lets the swap run as a host ``np.where`` before upload;
    the device then augments with the flags passed in. Bit-identical to
    the all-device path: the swap commutes with the spatial flips (they
    transform gt and init_pots identically), and all other draws use the
    same keys (pinned by tests/test_augmentation.py).

    When ``keys`` includes init_pots (``use_init_pots`` models) the step
    consumes it, so everything uploads and the swap stays on device.

    ``pack`` compresses the upload further (data/packing.py: bit-packed
    masks + fp16 labels, unpacked by one jitted device op before the
    augmentation jit sees the batch)."""
    mirror_fn, aug_fn, aug_flag_fn = jits
    if "init_pots" in batch and "init_pots" not in keys:
        fl = np.asarray(mirror_fn(k, batch["gt"].shape[0]))
        f = fl.reshape((-1,) + (1,) * (batch["gt"].ndim - 1))
        batch = dict(batch,
                     gt=np.where(f, batch["init_pots"], batch["gt"]),
                     mask=np.where(f, batch["init_mask"], batch["mask"]))
        dev = _upload(batch, keys, pack)
        return aug_flag_fn(k, dev, jnp.asarray(fl))
    dev = _upload(batch, tuple(batch.keys()), pack)
    return aug_fn(k, dev)


_unpack_jit = jax.jit(unpack_batch_device)


def _upload(batch: Dict, keys, pack: bool) -> Dict:
    """H2D upload of the ``keys`` subset, optionally wire-compressed
    (data/packing.py). The jitted unpack restores the canonical batch
    contract on device, so callers always receive f32 labels + bool
    masks regardless of what travelled."""
    host = {k: batch[k] for k in keys if k in batch}
    if not pack:
        return {k: jnp.asarray(v) for k, v in host.items()}
    dev = {k: jnp.asarray(v) for k, v in pack_batch_host(host).items()}
    return dict(_unpack_jit(dev))


class _Prefetcher:
    """Bounded background input stage for the training loops.

    The reference overlaps host-side input work with device compute via
    DataLoader workers + ``pin_memory=True`` (train.py:100). Here a single
    worker thread walks the batch iterator and runs ``prep`` — host numpy
    assembly, H2D transfer (``jnp.asarray``), augmentation dispatch,
    sharding — for up to ``depth`` batches ahead, while the main thread
    keeps the chip fed with already-staged batches. Without it, every
    step serializes: [assemble batch → upload → dispatch] × N; with it,
    batch N+1's assembly+upload rides under step N's device execution
    (measured end to end in benchmarks/production_loop_throughput.json).

    One worker (not a pool) on purpose: ``prep`` splits the augmentation
    PRNG key per batch, and a single thread preserves the split order, so
    training is bit-identical to the synchronous path (pinned by
    tests/test_train_slice.py::test_prefetch_matches_synchronous).
    ``depth=0`` degrades to synchronous inline prep (no thread).
    """

    _DONE = object()

    def __init__(self, it, prep_fn, depth: int = 2):
        self._it, self._prep, self._depth = it, prep_fn, max(int(depth), 0)
        self._thread = None
        if self._depth == 0:
            return
        import queue
        import threading

        self._q = queue.Queue(maxsize=self._depth)
        self._stop = threading.Event()
        self._err = []

        def work():
            try:
                for b in self._it:
                    staged = self._prep(b)
                    while not self._stop.is_set():
                        try:
                            self._q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                self._err.append(e)
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(self._DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="stereospike-prefetch")
        self._thread.start()

    def __iter__(self):
        if self._depth == 0:
            for b in self._it:
                yield self._prep(b)
            return
        while True:
            item = self._q.get()
            if item is self._DONE:
                break
            yield item
        if self._err:
            raise self._err[0]

    def close(self) -> None:
        """Stop the worker and drop any staged-but-unconsumed batches
        (their device buffers free with them). Early loop exits —
        max_steps, preemption — land here via the context manager."""
        if self._thread is None:
            return
        self._stop.set()
        import queue

        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class _PreemptionGuard:
    """SIGTERM → finish the in-flight step, checkpoint, exit cleanly.

    Preemptible TPU VMs / cluster schedulers deliver SIGTERM ahead of
    shutdown; the reference would lose everything since its last best-val
    save (train.py:348-352 — weights-only, best-only). Here the guard sets
    a flag the step loop polls, the loop persists the EXACT resume point
    (params+optimizer+step+PRNG) and returns, and `--resume` continues.
    Signal handlers only install in the main thread; elsewhere (driver
    threads, tests running loops concurrently) the guard is a no-op."""

    def __init__(self):
        import signal

        self.requested = False
        self._signal = signal
        self._old = None
        try:
            self._old = signal.signal(signal.SIGTERM, self._on_term)
        except ValueError:  # not the main thread
            pass

    def _on_term(self, signum, frame):
        self.requested = True

    def restore(self) -> None:
        if self._old is not None:
            self._signal.signal(self._signal.SIGTERM, self._old)
            self._old = None


def _warm_preempt_collective() -> None:
    """Compile + establish :func:`_preempt_sync`'s cross-host allgather
    (executable AND transport context) BEFORE training starts and a
    SIGTERM can race it. A signal landing exactly during the collective's
    first context establishment can break its connect phase (observed on
    the CPU gloo transport as ``Gloo context initialization failed:
    Connect timeout`` cascading into every later dispatch —
    tests/test_multihost.py reproduces it without this warmup); the
    preemption path must be the most reliable code in the loop, so its
    one-time setup runs here, signal-free and in lockstep."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(jnp.asarray(0.0)).max()


def _preempt_sync(guard: "_PreemptionGuard", step_idx: int,
                  every: int = 16) -> bool:
    """Cross-host agreement on the preemption flag. Single-process: the
    local flag, checked every step. Multi-host: a host leaving the step
    loop alone deadlocks the others' gradient collectives, so hosts must
    break at the SAME boundary — the flag is OR-reduced across processes
    at a fixed step cadence (lockstep data sharding guarantees identical
    ``step_idx`` everywhere), a tiny blocking collective that also bounds
    run-ahead skew to ``every`` steps."""
    if jax.process_count() == 1:
        return guard.requested
    if step_idx % every:
        return False
    from jax.experimental import multihost_utils

    flag = jnp.asarray(1.0 if guard.requested else 0.0)
    return bool(multihost_utils.process_allgather(flag).max() > 0)


def _viz_dir(cfg: TrainConfig) -> str:
    return os.path.join(cfg.checkpoint_dir, "visualizations")


def _save_viz_panel(path: str, batch: Dict, depth, title: str) -> None:
    """Render the reference's 4-panel figure (train.py:234-235,
    test.py:153-154) for sample 0 of a batch. Lead-process-only, like all
    shared-filesystem side effects (the batch slice is replicated)."""
    from stereospike_tpu.utils.logging import is_lead_process
    from stereospike_tpu.viz import save_panel

    if not is_lead_process():
        return
    if getattr(depth, "is_fully_addressable", True) is False:
        # multi-host sharded eval output: sample 0's shard may live on
        # another host's devices, and np.asarray on a non-addressable
        # array raises. Depth panels are a convenience — skip rather
        # than pay a cross-host gather inside the epoch loop.
        warnings.warn("save_viz skipped: depth is sharded across hosts")
        return

    save_panel(path,
               np.asarray(batch["chunks"])[0, 0],
               np.asarray(depth)[0],
               np.asarray(batch["gt"])[0],
               np.asarray(batch["mask"])[0],
               title=title)


def _load_params(cfg: TrainConfig, model_cfg, which: str):
    """Inference-loop params: a reference .pth (``import_pth``) wins, else
    the run's checkpoint, else fresh init (interop.py key mapping)."""
    if cfg.import_pth:
        from stereospike_tpu.interop import load_torch_checkpoint

        return load_torch_checkpoint(cfg.import_pth, model_cfg)
    params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    if has_checkpoint(cfg.checkpoint_dir, which):
        params = restore_params(cfg.checkpoint_dir, params, which)
    return params


def train_loop(
    cfg: TrainConfig,
    *,
    synthetic: bool = False,
    max_steps: Optional[int] = None,
    data=None,
    return_state: bool = False,
) -> Dict:
    """Full training run (reference train.py epoch loop, :180-356).

    Per epoch: shuffled train pass (optional augmentation folded into the
    device program) → validation pass → best-on-val checkpoint + full-state
    ``latest`` for exact resume. Returns a summary dict
    (``return_state=True`` adds the final ``TrainState`` under ``"state"``
    — used by tests that must inspect THIS process's in-memory state, e.g.
    the multi-host equivalence test, where only the lead checkpoints).
    """
    if is_ann_model(cfg.model):
        return _ann_train_loop(cfg, synthetic=synthetic, max_steps=max_steps,
                               data=data)
    if cfg.debug_nans:
        enable_nan_debugging(True)

    model_cfg = build_model_config(cfg)
    loss_cfg = _loss_config(cfg)
    binocular = cfg.model != "stereospike_monocular"

    train_view, val_view, _ = data or _make_data(cfg, synthetic, None)
    # multi-host: the train iterator process-shards the sample order
    # (batch_size per host, disjoint strides — _batch_iter), so the GLOBAL
    # step count per epoch divides by the process count; the LR schedule
    # must be built on it or the epoch milestones shift by ×process_count
    steps_per_epoch = max(
        len(train_view) // (cfg.batch_size * jax.process_count()), 1)

    # LR milestones are epoch-based (MultiStepLR [8,42,60]); the schedule is
    # step-indexed, so a resume with a different batch size/dataset must use
    # the ORIGINAL steps_per_epoch or the milestones silently shift
    sched_steps = steps_per_epoch
    resume_skip = 0
    if cfg.resume and has_checkpoint(cfg.checkpoint_dir):
        meta = load_meta(cfg.checkpoint_dir) or {}
        sched_steps = int(meta.get("steps_per_epoch", steps_per_epoch))
        # mid-epoch preemption point: batches of the interrupted epoch
        # already consumed (see the preemption save below)
        resume_skip = int(meta.get("epoch_step_offset", 0))
    sched = multistep_lr_schedule(cfg.learning_rate, cfg.lr_milestones,
                                  cfg.lr_gamma, sched_steps)
    tx = make_optimizer(sched, cfg.weight_decay)

    rng = jax.random.PRNGKey(cfg.seed)
    k_init, k_state = jax.random.split(rng)
    params = init_params(k_init, model_cfg)
    if cfg.import_pth:
        # warm-start from a reference torch checkpoint (interop.py); a
        # resume from this run's own checkpoint below still takes priority
        from stereospike_tpu.interop import load_torch_checkpoint

        params = load_torch_checkpoint(cfg.import_pth, model_cfg)
    state = create_train_state(params, tx, k_state)

    if cfg.resume and has_checkpoint(cfg.checkpoint_dir):
        state = restore_checkpoint(cfg.checkpoint_dir, state)

    dtype = _compute_dtype(cfg)
    mesh = _device_setup(cfg)
    # a (d, s>1) mesh shards the image H axis over 'spatial' (GSPMD inserts
    # the conv halo exchanges); a size-1 spatial axis degenerates to pure DP
    spatial = mesh is not None and mesh.devices.shape[1] > 1
    if spatial and cfg.in_hw[0] % mesh.devices.shape[1]:
        warnings.warn(
            f"H={cfg.in_hw[0]} does not divide over the spatial mesh axis "
            f"{mesh.devices.shape[1]}; GSPMD will pad — expect some wasted "
            "compute on the last shard")
    # batch keys the device step consumes (everything else is stripped after
    # augmentation)
    keep = ["chunks", "gt", "mask"]
    if cfg.use_warmup:
        keep.append("warmup")
    if cfg.use_init_pots:
        keep.append("init_pots")

    step_kw = dict(learn_on=cfg.learn_on, compute_dtype=dtype,
                   multistep=cfg.multistep, use_warmup=cfg.use_warmup,
                   use_init_pots=cfg.use_init_pots,
                   accum_steps=cfg.accum_steps)
    train_step = make_train_step(model_cfg, loss_cfg, tx, **step_kw)
    base_eval = make_eval_step(model_cfg, loss_cfg, learn_on=cfg.learn_on,
                               compute_dtype=dtype, multistep=cfg.multistep)
    # a short final val batch (drop_last=False) need not divide over the
    # data axis; those remainder batches run on the single-device step
    eval_step_local = jax.jit(base_eval)
    if mesh is not None:
        train_step = make_sharded_train_step(train_step, mesh, spatial=spatial,
                                             batch_keys=tuple(keep),
                                             donate=True)
        eval_step_sharded = make_sharded_eval_step(base_eval, mesh,
                                                   spatial=spatial)
    else:
        # donate the TrainState: the loop only ever threads the returned
        # state forward, so params/optimizer buffers update in place
        train_step = jax.jit(train_step, donate_argnums=(0,))
        eval_step_sharded = None

    def eval_divisible(bsz: int) -> bool:
        return mesh is not None and bsz % mesh.devices.shape[0] == 0

    aug_cfg = AugmentConfig(eyes=2 if binocular else 1)
    aug = jax.jit(lambda k, b: augment_batch(k, b, aug_cfg))
    aug_fl = jax.jit(lambda k, b, fl: augment_batch(k, b, aug_cfg,
                                                    mirror_flag=fl))
    mirror = jax.jit(lambda k, n: time_mirror_flags(k, n, aug_cfg),
                     static_argnums=1)

    # training-time spike observability: per-tap densities on one val batch
    # (one extra forward every cfg.log_firing_rates epochs), profiled over
    # the full T-step sequence the model actually trains with
    rate_fn = None
    if cfg.log_firing_rates:
        rate_fn = jax.jit(lambda p, chunks: jnp.stack(
            [firing_rates_sequence(p, chunks, model_cfg)[k]
             for k in TAP_NAMES]))

    logger = MetricsLogger(cfg.checkpoint_dir,
                           tensorboard=cfg.tensorboard)
    logger.text(
        f"model={cfg.model} params={count_params(params):,} "
        f"devices={len(jax.devices())} steps/epoch={steps_per_epoch} "
        f"batch={cfg.batch_size} T={cfg.n_timesteps} "
        f"multistep={cfg.multistep} lr={cfg.learning_rate} "
        f"dtype={cfg.compute_dtype} augment={cfg.augment}")

    def prep(batch: Dict, train: bool = True, shard: bool = True) -> Dict:
        # only the keys the step (or the augmentation) will read are
        # uploaded — init_pots/init_mask are 36% of a default batch's
        # bytes and exist only to feed the time-mirror swap, which
        # _upload_augmented performs on HOST (see its docstring)
        keys = keep if train else ("chunks", "gt", "mask")
        # wire compression applies to TRAIN uploads only: eval metrics stay
        # float-exact (packing quantizes gt to fp16 — see data/packing.py)
        pack = cfg.pack_io and train
        if cfg.augment and train:
            nonlocal aug_key
            aug_key, k = jax.random.split(aug_key)
            batch = _upload_augmented(batch, k, keys, (mirror, aug, aug_fl),
                                      pack=pack)
        else:
            batch = _upload(batch, keys, pack)
        batch = {k: batch[k] for k in keys if k in batch}
        if mesh is not None and shard:
            batch = shard_batch(batch, mesh, spatial=spatial)
        return batch

    # fold in the process index: multi-host DP gives each host DIFFERENT
    # samples, so identical per-host key streams would correlate the
    # augmentation draws across the global batch
    aug_key = jax.random.fold_in(jax.random.fold_in(rng, 1234),
                                 jax.process_index())
    start_epoch = int(state.epoch)
    done = False
    summary: Dict = {}

    steps_done = int(state.step)  # host-side mirror of state.step
    _warm_preempt_collective()
    guard = _PreemptionGuard()
    try:
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            # metrics stay ON DEVICE during the epoch: jax dispatch is async, so
            # a per-step float() would block the host on a D2H fetch every step
            # (≈2×RTT through this environment's device tunnel — more than the
            # step's compute) and serialize prep(k+1) behind step k. Deferring
            # the fetch lets the host prep/upload the next batch while the chip
            # runs the current step; one stack+sum at epoch end fetches all.
            step_metrics = []
            preempt_now = False
            base_off = resume_skip if epoch == start_epoch else 0
            batch_it = iter(_batch_iter(cfg, train_view,
                                        shard_over_processes=True,
                                        shuffle=True, seed=cfg.seed + epoch))
            for _ in range(base_off):
                # mid-epoch resume: replay the seed-deterministic batch
                # order up to the preemption point without training, and
                # burn the matching augmentation split so every later
                # batch draws the key the uninterrupted run would have.
                # Runs BEFORE the prefetch worker starts splitting keys.
                if next(batch_it, None) is None:
                    break
                if cfg.augment:
                    aug_key, _ = jax.random.split(aug_key)
            # staged input pipeline: batch N+1's assembly + H2D upload ride
            # under step N's (async-dispatched) device execution
            with _Prefetcher(batch_it, prep, depth=cfg.prefetch) as staged:
                for batch in staged:
                    state, metrics = train_step(state, batch)
                    step_metrics.append((metrics["loss"], metrics["mde"]))
                    steps_done += 1
                    if max_steps is not None and steps_done >= max_steps:
                        done = True
                        break
                    if _preempt_sync(guard, steps_done):
                        preempt_now = True
                        break
            if preempt_now:
                # preemption: persist the exact resume point NOW — including
                # the within-epoch batch cursor, so --resume continues this
                # epoch where it left off instead of retraining its head —
                # and skip validation (the grace window may not cover it)
                save_checkpoint(
                    cfg.checkpoint_dir, state,
                    meta_extra={"steps_per_epoch": sched_steps,
                                "epoch_step_offset":
                                    base_off + len(step_metrics)})
                logger.text(f"SIGTERM: checkpointed at step {steps_done}; "
                            "resume with --resume true")
                summary = {"epoch": epoch, "step": steps_done, "preempted": True}
                break
            n_steps = len(step_metrics)
            train_loss, train_mde = map(float, _fetch_sums(step_metrics))
            train_time = time.time() - t0

            # validation (reference train.py:275-335). eval_step returns
            # per-sample means, so weighting by the batch's sample count makes
            # the epoch statistics exactly the reference's per-sample math even
            # with batch_size > 1 and a short final batch (drop_last=False).
            t0 = time.time()
            n_val = n_val_batches = 0
            # same async pattern as training: keep only the per-batch scalar
            # means on device (weighted by sample count — NOT the big depth
            # maps, which would pin HBM) and fetch once after the loop
            val_stats = []
            fr_scalars: Dict[str, float] = {}
            for batch in _batch_iter(cfg, val_view, drop_last=False):
                bsz = batch["gt"].shape[0]
                use_mesh = eval_divisible(bsz)
                step = eval_step_sharded if use_mesh else eval_step_local
                out = step(state.params, prep(batch, train=False, shard=use_mesh))
                val_stats.append((out["loss"] * bsz, out["mde"] * bsz))
                if n_val_batches == 0 and cfg.save_viz:
                    _save_viz_panel(
                        os.path.join(_viz_dir(cfg), f"epoch_{epoch:04d}.png"),
                        batch, out["depth"], title=f"epoch {epoch}")
                if (n_val_batches == 0 and rate_fn is not None
                        and epoch % cfg.log_firing_rates == 0):
                    rates = np.asarray(
                        rate_fn(state.params, jnp.asarray(batch["chunks"])))
                    fr_scalars = {f"fr_{k}": float(v)
                                  for k, v in zip(TAP_NAMES, rates)}
                n_val += bsz
                n_val_batches += 1
            val_loss, val_mde = map(float, _fetch_sums(val_stats))
            val_time = time.time() - t0

            state = state._replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
            scalars = {
                "train_loss": train_loss / max(n_steps, 1),
                "train_MDE": train_mde / max(n_steps, 1),
                "val_loss": val_loss / max(n_val, 1),
                "val_MDE": val_mde / max(n_val, 1),
                "lr": float(sched(steps_done)),
                "train_time_s": train_time,
                "val_time_s": val_time,
                # wall-clock event-frame throughput incl. host prep/augment —
                # the number to compare against bench.py's device-only rate
                "train_frames_per_s": round(
                    n_steps * cfg.batch_size * cfg.n_timesteps
                    / max(train_time, 1e-9), 2),
                **fr_scalars,
            }
            logger.log(scalars, step=steps_done, epoch=epoch)
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
            save_checkpoint(cfg.checkpoint_dir, state, best=is_best, tag=tag,
                            meta_extra={"steps_per_epoch": sched_steps})
            summary = {"epoch": epoch, **scalars,
                       "best_val_MDE": float(state.best_metric)}
            if done:
                break

    finally:
        # always restore the previous SIGTERM handler (an exception
        # mid-epoch must not leave the process deaf to termination)
        guard.restore()
        logger.close()
    if return_state:
        summary = dict(summary, state=state)
    return summary


def eval_loop(cfg: TrainConfig, *, synthetic: bool = False, data=None,
              which: str = "best.msgpack") -> Dict:
    """Offline test-set evaluation (reference test.py): restore checkpoint,
    accumulate loss + MDE, write ``test_results.txt``. Only the test
    sequence is loaded (test.py:64-67)."""
    if is_ann_model(cfg.model):
        return _ann_eval_loop(cfg, synthetic=synthetic, data=data, which=which)
    model_cfg = build_model_config(cfg)
    loss_cfg = _loss_config(cfg)
    test_view = _test_view(cfg, synthetic, data)

    params = _load_params(cfg, model_cfg, which)

    base_eval = make_eval_step(model_cfg, loss_cfg, learn_on=cfg.learn_on,
                               compute_dtype=_compute_dtype(cfg),
                               multistep=cfg.multistep)
    eval_step_local = jax.jit(base_eval)
    mesh = _device_setup(cfg)  # offline eval honors the same mesh contract
    spatial = mesh is not None and mesh.devices.shape[1] > 1
    eval_step_sharded = (make_sharded_eval_step(base_eval, mesh,
                                                spatial=spatial)
                         if mesh is not None else None)
    # eval_step returns per-sample means; weight by the batch's sample count
    # so batch_size>1 + drop_last=False reproduce the reference's per-sample
    # accumulation (test.py:157-173) exactly
    n_samples = n = 0
    # async accumulation (see train_loop): per-batch weighted scalar means
    # stay on device; one fetch at the end instead of a D2H sync per batch
    stats = []
    for batch in _batch_iter(cfg, test_view, drop_last=False):
        b = {k: jnp.asarray(batch[k]) for k in ("chunks", "gt", "mask")}
        bsz = batch["gt"].shape[0]
        use_mesh = mesh is not None and bsz % mesh.devices.shape[0] == 0
        if use_mesh:
            b = shard_batch(b, mesh, spatial=spatial)
        out = (eval_step_sharded if use_mesh else eval_step_local)(params, b)
        stats.append((out["loss"] * bsz, out["mde"] * bsz))
        if cfg.save_viz and n % cfg.save_viz == 0:
            _save_viz_panel(
                os.path.join(_viz_dir(cfg), f"test_{n:05d}.png"),
                batch, out["depth"], title=f"test batch {n}")
        n_samples += bsz
        n += 1
    tot = _fetch_sums(stats)
    results = {"test_loss": float(tot[0]) / max(n_samples, 1),
               "test_MDE": float(tot[1]) / max(n_samples, 1),
               "n_batches": n, "n_samples": n_samples}
    logger = MetricsLogger(cfg.checkpoint_dir, name="test",
                           tensorboard=cfg.tensorboard)
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
    if is_ann_model(cfg.model):
        raise ValueError("firing-rates profiles spike densities; ANN models "
                         "have no spikes (use an SNN model)")
    model_cfg = build_model_config(cfg)
    test_view = _test_view(cfg, synthetic, data)

    params = _load_params(cfg, model_cfg, which)

    # ONE forward per batch returning all 14 tap densities, stacked on
    # device and fetched once (D2H round-trips through the device tunnel are
    # the expensive part here). No-grad → inference execution profile.
    # Densities cover the FULL T-step sequence (state carried, mean over
    # steps) — at the reference recipe's T=1 this is exactly its stateless
    # per-chunk measurement (calculate_firing_rates.py:125-135).
    rates_cfg = model_cfg.for_inference()

    def _rates(p, chunks):
        taps = firing_rates_sequence(p, chunks, rates_cfg)
        return jnp.stack([taps[k] for k in TAP_NAMES])

    rate_fn = jax.jit(_rates)
    acc = np.zeros(len(TAP_NAMES))
    n = 0
    for batch in _batch_iter(cfg, test_view, drop_last=False):
        acc += np.asarray(rate_fn(params, jnp.asarray(batch["chunks"])))
        n += 1
    out = {k: float(v) / max(n, 1) for k, v in zip(TAP_NAMES, acc)}

    logger = MetricsLogger(cfg.checkpoint_dir, name="firing_rates",
                           tensorboard=cfg.tensorboard)
    logger.log(out)
    enc = np.mean([out[k] for k in TAP_NAMES[:6]])
    dec = np.mean([out[k] for k in TAP_NAMES[6:]])
    for k, v in out.items():
        logger.text(f"{k}: {v:.4f}")
    logger.text(f"mean encoder rate: {enc:.4f}  mean decoder rate: {dec:.4f}")
    logger.close()
    return out


def stream_loop(cfg: TrainConfig, *, synthetic: bool = False,
                events_dir: Optional[str] = None, n_windows: int = 20,
                pipeline: int = 1, events_per_window: int = 20000,
                save_video: Optional[str] = None, aer_format: str = "TXYP",
                listen: Optional[str] = None, source=None,
                reply: bool = False, artifact: Optional[str] = None,
                aedat: Optional[str] = None, realtime: bool = False,
                which: str = "best.msgpack") -> Dict:
    """Streaming-serving driver: feed event windows through the
    :class:`~stereospike_tpu.streaming.StreamingEvaluator` (the low-latency
    B=1 mode the reference's dataset-replay eval never had).

    Sources (:mod:`stereospike_tpu.sources`): ``synthetic`` random windows;
    ``events_dir`` — a DENSE-format ``events/data/*.npy`` directory (TXYP,
    one file per window; monocular); ``listen`` — ``"host:port"`` (or just
    ``"port"``) to accept a live SPKE-protocol TCP event feed; ``aedat``
    — an AEDAT 3.1 recording path (or ``"left,right"`` paths for a stereo
    rig); or an explicit ``source`` iterable of per-eye window dicts.
    Writes per-window latencies to JSONL and optionally a depth-map mp4.

    ``artifact``: serve from an exported ``.ssx`` deployment artifact
    (``cli export-serving``) instead of live params — geometry (eyes,
    window, block, n_streams) comes from its manifest and the compute step
    from its serialized StableHLO; ``cfg.model``/checkpoints are ignored.
    """
    from stereospike_tpu import sources as src
    from stereospike_tpu.streaming import StreamingEvaluator

    evaluator = None
    if artifact is not None:
        evaluator = StreamingEvaluator.from_artifact(
            artifact, pipeline=pipeline, reset_each_window=False)
        if evaluator.n_streams != 1:
            raise ValueError(
                f"this driver's sources emit single-camera windows; the "
                f"artifact serves n_streams={evaluator.n_streams} — use "
                "StreamingEvaluator.from_artifact directly and push() "
                "per-stream lists")
        eyes = evaluator.eyes
        binocular = len(eyes) > 1
    else:
        if is_ann_model(cfg.model):
            raise ValueError("streaming serves the stateful SNN models")
        model_cfg = build_model_config(cfg)
        binocular = cfg.model != "stereospike_monocular"
        params = _load_params(cfg, model_cfg, which)
        eyes = ("left", "right") if binocular else ("left",)

    # the MVSEC 20 Hz cadence (utils.py:6-11); an artifact's baked grid wins
    window_s = evaluator.window if evaluator is not None else 0.05
    max_windows = None  # set by the --listen branch (unbounded elsewhere)
    if source is not None:
        window_s = float(getattr(source, "window_s", window_s))
    elif listen is not None:
        host, _, port = listen.rpartition(":")
        # n_windows <= 0 = serve forever: accept successive producers
        # (reconnect) until one re-accept times out
        # the SOURCE OBJECT must survive (reply()/late_dropped live on
        # it — an islice wrapper would hide both): bound the window count
        # in the serving loop below instead
        source = src.SocketSource(host or "127.0.0.1", int(port),
                                  eyes=eyes, window_s=window_s,
                                  reconnect=(n_windows <= 0))
        max_windows = n_windows if n_windows > 0 else None
    elif aedat is not None:
        paths = [p for p in aedat.split(",") if p]
        if len(paths) != len(eyes):
            raise ValueError(
                f"model {cfg.model} consumes {len(eyes)} eye(s) "
                f"({'/'.join(eyes)}); --aedat got {len(paths)} path(s) — "
                "pass one AEDAT 3.1 file per eye, comma-separated")
        source = src.AedatFileSource(dict(zip(eyes, paths)),
                                     window_s=window_s,
                                     n_windows=n_windows or None,
                                     realtime=realtime)
    elif events_dir is not None:
        if binocular:
            raise ValueError("events_dir is a monocular (DENSE-format) "
                             "source; use model=stereospike_monocular")
        # the evaluator's bin grid is window/nfpdm, baked into its jitted
        # step — ReplayDirSource derives the window from the MAX time span
        # across the served files (DENSE cadence is not exactly constant;
        # sizing from only the first file would silently mask out the tail
        # events of any longer window in the voxelizer's dump bin)
        source = src.ReplayDirSource(events_dir, aer_format=aer_format,
                                     n_windows=n_windows)
        window_s = source.window_s
    else:
        if not synthetic:
            raise ValueError("need --synthetic, an events_dir, an --aedat "
                             "recording, or a --listen source")
        hw_eff = (tuple(evaluator.artifact.meta["in_hw"])
                  if evaluator is not None else tuple(cfg.in_hw))
        source = src.SyntheticSource(
            hw=hw_eff, eyes=eyes, n_windows=n_windows,
            events_per_window=events_per_window, window_s=window_s,
            seed=cfg.seed)

    if evaluator is None:
        evaluator = StreamingEvaluator(
            params, model_cfg, eyes=eyes, nfpdm=cfg.nfpdm, window=window_s,
            reset_each_window=False, pipeline=pipeline,
            compute_dtype=_compute_dtype(cfg))
    elif abs(window_s - evaluator.window) > 0.1 * evaluator.window:
        # the artifact's bin grid (window/nfpdm) is baked into its step:
        # replaying a source with a different cadence mis-bins the tail
        warnings.warn(
            f"source window {window_s * 1e3:.1f} ms differs from the "
            f"artifact's baked {evaluator.window * 1e3:.1f} ms grid; "
            "events past the grid land in the dump bin (binned_out_events)")

    # ``reply``: send each depth map back to a connected SPKE producer
    # (sources.SocketSource.reply / recv_depth) — events in, depths out
    # over one connection. With pipelining the replies lag by `pipeline`.
    can_reply = reply and hasattr(source, "reply")
    if reply and not can_reply:
        raise ValueError("--reply needs a --listen (socket) source")
    if can_reply and max_windows is None and pipeline:
        # serve-forever spans producer reconnects: an in-flight pipelined
        # depth from producer A would otherwise be replied over producer
        # B's fresh connection (off-by-pipeline across the boundary).
        # Synchronous replies keep window→depth→reply on one connection.
        warnings.warn("--reply with --n-windows 0 forces --pipeline 0 "
                      "(pipelined replies would cross producer reconnects)")
        pipeline = 0
        evaluator.pipeline = 0

    def try_reply(d):
        # per-reply guard, NOT a latch: a producer that stops reading only
        # loses its own replies — the next producer gets them again
        if can_reply:
            try:
                source.reply(d)
            except (OSError, RuntimeError):
                pass

    # depth maps are retained only when save_video needs them: in
    # serve-forever mode an unbounded list of [H, W, 1] float32 maps
    # (~0.36 MB each at full res, 20 Hz) would leak ~26 GB/day
    keep_depths = bool(save_video)
    lat, depths = [], []
    n_served = 0
    t_prev = time.time()
    for win in source:
        t0 = time.time()
        d = evaluator.push(win)
        lat.append(time.time() - t0)
        if d is not None:
            n_served += 1
            if keep_depths:
                depths.append(d)
            try_reply(d)
        if max_windows is not None and len(lat) >= max_windows:
            break
    while True:
        d = evaluator.flush()
        if d is None:
            break
        n_served += 1
        if keep_depths:
            depths.append(d)
        try_reply(d)
    lat_ms = np.asarray(lat[1:] or lat) * 1e3  # drop the compile window

    if save_video and depths:
        from stereospike_tpu.viz import depth_video

        os.makedirs(os.path.dirname(os.path.abspath(save_video)), exist_ok=True)
        depth_video(np.stack(depths), save_video, fps=20)

    results = {
        "n_windows": n_served,
        "interval_ms_mean": round(float(lat_ms.mean()), 3) if len(lat_ms) else None,
        "interval_ms_p99": round(float(np.percentile(lat_ms, 99)), 3) if len(lat_ms) else None,
        "pipeline": pipeline,
        "dropped_events": int(sum(b.dropped
                                  for sb in evaluator.stream_buffers
                                  for b in sb.values())),
        # events the voxelizer rejected (out-of-window timestamps / FOV) —
        # nonzero here usually means a mis-relativized event feed
        "binned_out_events": int(evaluator.binning_dropped),
        # SocketSource: events that arrived after their window was emitted
        "late_events": int(getattr(source, "late_dropped", 0)),
        "video": save_video if save_video and depths else None,
        "total_time_s": round(time.time() - t_prev, 3),
    }
    logger = MetricsLogger(cfg.checkpoint_dir, name="stream",
                           tensorboard=cfg.tensorboard)
    logger.log(results)
    logger.close()
    return results


# ----------------------------------------------------------- ANN baselines
def _ann_train_loop(cfg: TrainConfig, *, synthetic: bool = False,
                    max_steps: Optional[int] = None, data=None) -> Dict:
    """Equivalent-ANN training (reference train.py with the ANN constructor
    swapped in, :118-120; identical data/recipe so paper Table 4 reproduces)."""
    if cfg.debug_nans:
        enable_nan_debugging(True)
    ann_cfg = build_ann_config(cfg)
    loss_cfg = _loss_config(cfg)

    train_view, val_view, _ = data or _make_data(cfg, synthetic, None)
    # multi-host: the train iterator process-shards the sample order
    # (batch_size per host, disjoint strides — _batch_iter), so the GLOBAL
    # step count per epoch divides by the process count; the LR schedule
    # must be built on it or the epoch milestones shift by ×process_count
    steps_per_epoch = max(
        len(train_view) // (cfg.batch_size * jax.process_count()), 1)
    sched_steps = steps_per_epoch
    resume_skip = 0
    if cfg.resume and has_checkpoint(cfg.checkpoint_dir):
        meta = load_meta(cfg.checkpoint_dir) or {}
        sched_steps = int(meta.get("steps_per_epoch", steps_per_epoch))
        resume_skip = int(meta.get("epoch_step_offset", 0))
    sched = multistep_lr_schedule(cfg.learning_rate, cfg.lr_milestones,
                                  cfg.lr_gamma, sched_steps)
    tx = make_optimizer(sched, cfg.weight_decay)

    params = init_ann_params(jax.random.PRNGKey(cfg.seed), ann_cfg)
    ann_bn = init_ann_state(ann_cfg)
    if cfg.import_pth:
        # warm-start from a reference ANN .pth (interop.py)
        from stereospike_tpu.interop import load_torch_ann_checkpoint

        params, ann_bn = load_torch_ann_checkpoint(cfg.import_pth)
    state = create_ann_train_state(params, ann_bn, tx)
    if cfg.resume and has_checkpoint(cfg.checkpoint_dir):
        state = restore_checkpoint(cfg.checkpoint_dir, state)

    # multi-device: same mesh contract as the SNN loop. BN batch statistics
    # stay GLOBAL-batch under the data axis (GSPMD lowers the sharded-axis
    # mean to a global reduction), so DP ANN training is semantics-identical
    # to single-device — see parallel/mesh.py ANN section.
    mesh = _device_setup(cfg)
    spatial = mesh is not None and mesh.devices.shape[1] > 1
    base_train = make_ann_train_step(ann_cfg, loss_cfg, tx,
                                     learn_on=cfg.learn_on)
    base_eval = make_ann_eval_step(ann_cfg, loss_cfg, learn_on=cfg.learn_on)
    eval_step_local = jax.jit(base_eval)
    if mesh is not None:
        from stereospike_tpu.parallel import (
            make_sharded_ann_eval_step,
            make_sharded_ann_train_step,
        )

        train_step = make_sharded_ann_train_step(base_train, mesh,
                                                 spatial=spatial, donate=True)
        eval_step_sharded = make_sharded_ann_eval_step(base_eval, mesh,
                                                       spatial=spatial)
    else:
        # donate the state (the loop only threads the returned one forward)
        train_step = jax.jit(base_train, donate_argnums=(0,))
        eval_step_sharded = None

    def eval_divisible(bsz: int) -> bool:
        return mesh is not None and bsz % mesh.devices.shape[0] == 0

    ann_aug_cfg = AugmentConfig()
    aug = jax.jit(lambda k, b: augment_batch(k, b, ann_aug_cfg))
    aug_fl = jax.jit(lambda k, b, fl: augment_batch(k, b, ann_aug_cfg,
                                                    mirror_flag=fl))
    mirror = jax.jit(lambda k, n: time_mirror_flags(k, n, ann_aug_cfg),
                     static_argnums=1)
    aug_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 777),
                                 jax.process_index())  # see train_loop

    logger = MetricsLogger(cfg.checkpoint_dir,
                           tensorboard=cfg.tensorboard)
    logger.text(f"model={cfg.model} (ANN {ann_cfg.activation}) "
                f"params={count_params(params):,} "
                f"steps/epoch={steps_per_epoch} batch={cfg.batch_size}")

    def prep(batch: Dict, train: bool = True, shard: bool = True) -> Dict:
        # same input path as the SNN loop: host-side time-mirror swap, no
        # init_pots/init_mask upload (the ANN step never consumes them)
        pack = cfg.pack_io and train   # eval stays float-exact (see train_loop)
        if cfg.augment and train:
            nonlocal aug_key
            aug_key, k = jax.random.split(aug_key)
            batch = _upload_augmented(batch, k, ("chunks", "gt", "mask"),
                                      (mirror, aug, aug_fl), pack=pack)
        else:
            batch = _upload(batch, ("chunks", "gt", "mask"), pack)
        batch = {k: batch[k] for k in ("chunks", "gt", "mask") if k in batch}
        if mesh is not None and shard:
            batch = shard_batch(batch, mesh, spatial=spatial)
        return batch

    done = False
    summary: Dict = {}
    steps_done = int(state.step)
    start_epoch = int(state.epoch)
    _warm_preempt_collective()
    guard = _PreemptionGuard()
    try:
        for epoch in range(start_epoch, cfg.epochs):
            # async accumulation (see train_loop): metrics stay on device during
            # the epoch; a per-step float() would D2H-sync every step
            step_metrics = []
            preempt_now = False
            base_off = resume_skip if epoch == start_epoch else 0
            batch_it = iter(_batch_iter(cfg, train_view,
                                        shard_over_processes=True,
                                        shuffle=True, seed=cfg.seed + epoch))
            for _ in range(base_off):  # mid-epoch resume: see train_loop
                if next(batch_it, None) is None:
                    break
                if cfg.augment:
                    aug_key, _ = jax.random.split(aug_key)
            with _Prefetcher(batch_it, prep, depth=cfg.prefetch) as staged:
                for batch in staged:
                    state, metrics = train_step(state, batch)
                    step_metrics.append((metrics["loss"], metrics["mde"]))
                    steps_done += 1
                    if max_steps is not None and steps_done >= max_steps:
                        done = True
                        break
                    if _preempt_sync(guard, steps_done):
                        preempt_now = True
                        break
            if preempt_now:  # see train_loop: checkpoint now, skip val
                save_checkpoint(
                    cfg.checkpoint_dir, state,
                    meta_extra={"steps_per_epoch": sched_steps,
                                "epoch_step_offset":
                                    base_off + len(step_metrics)})
                logger.text(f"SIGTERM: checkpointed at step {steps_done}; "
                            "resume with --resume true")
                summary = {"epoch": epoch, "step": steps_done, "preempted": True}
                break
            n_steps = len(step_metrics)
            tr = _fetch_sums(step_metrics)
            val_stats = []
            n_val = 0
            for batch in _batch_iter(cfg, val_view, drop_last=False):
                bsz = batch["gt"].shape[0]
                # a short final batch (drop_last=False) need not divide over
                # the data axis; remainders run on the single-device step
                use_mesh = eval_divisible(bsz)
                step = eval_step_sharded if use_mesh else eval_step_local
                out = step(state.params, state.bn_state,
                           prep(batch, train=False, shard=use_mesh))
                val_stats.append((out["loss"] * bsz, out["mde"] * bsz))
                n_val += bsz
            va = _fetch_sums(val_stats)
            state = state._replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
            scalars = {"train_loss": float(tr[0]) / max(n_steps, 1),
                       "train_MDE": float(tr[1]) / max(n_steps, 1),
                       "val_loss": float(va[0]) / max(n_val, 1),
                       "val_MDE": float(va[1]) / max(n_val, 1)}
            logger.log(scalars, step=steps_done, epoch=epoch)
            is_best = n_val > 0 and scalars["val_MDE"] < float(state.best_metric)
            if is_best:
                state = state._replace(
                    best_metric=jnp.asarray(scalars["val_MDE"], jnp.float32))
            save_checkpoint(cfg.checkpoint_dir, state, best=is_best,
                            meta_extra={"steps_per_epoch": sched_steps})
            summary = {"epoch": epoch, **scalars,
                       "best_val_MDE": float(state.best_metric)}
            if done:
                break
    finally:
        # always restore the previous SIGTERM handler (an exception
        # mid-epoch must not leave the process deaf to termination)
        guard.restore()
        logger.close()
    return summary


def _ann_eval_loop(cfg: TrainConfig, *, synthetic: bool = False, data=None,
                   which: str = "best.msgpack") -> Dict:
    """Equivalent-ANN test-set evaluation (reference test.py evaluating the
    ANN — its committed default, test.py:80-84)."""
    from stereospike_tpu.train.checkpoint import restore_fields

    ann_cfg = build_ann_config(cfg)
    loss_cfg = _loss_config(cfg)
    test_view = _test_view(cfg, synthetic, data)

    if cfg.import_pth:
        # reference ANN checkpoint (the committed test.py:80-84 evaluates
        # exactly this model) — interop.py key mapping
        from stereospike_tpu.interop import load_torch_ann_checkpoint

        params, bn_state = load_torch_ann_checkpoint(cfg.import_pth)
    else:
        params = init_ann_params(jax.random.PRNGKey(cfg.seed), ann_cfg)
        bn_state = init_ann_state(ann_cfg)
        if has_checkpoint(cfg.checkpoint_dir, which):
            restored = restore_fields(
                cfg.checkpoint_dir,
                {"params": params, "bn_state": bn_state}, which)
            params, bn_state = restored["params"], restored["bn_state"]

    base_eval = make_ann_eval_step(ann_cfg, loss_cfg, learn_on=cfg.learn_on)
    eval_step_local = jax.jit(base_eval)
    mesh = _device_setup(cfg)  # same multi-device contract as eval_loop
    spatial = mesh is not None and mesh.devices.shape[1] > 1
    eval_step_sharded = None
    if mesh is not None:
        from stereospike_tpu.parallel import make_sharded_ann_eval_step

        eval_step_sharded = make_sharded_ann_eval_step(base_eval, mesh,
                                                       spatial=spatial)
    n_samples = n = 0
    stats = []  # async accumulation, see eval_loop
    for batch in _batch_iter(cfg, test_view, drop_last=False):
        b = {k: jnp.asarray(batch[k]) for k in ("chunks", "gt", "mask")}
        bsz = batch["gt"].shape[0]
        use_mesh = mesh is not None and bsz % mesh.devices.shape[0] == 0
        if use_mesh:
            b = shard_batch(b, mesh, spatial=spatial)
        out = (eval_step_sharded if use_mesh else eval_step_local)(
            params, bn_state, b)
        stats.append((out["loss"] * bsz, out["mde"] * bsz))
        if cfg.save_viz and n % cfg.save_viz == 0:
            _save_viz_panel(
                os.path.join(_viz_dir(cfg), f"test_{n:05d}.png"),
                batch, out["depth"], title=f"test batch {n}")
        n_samples += bsz
        n += 1
    tot = _fetch_sums(stats)
    results = {"test_loss": float(tot[0]) / max(n_samples, 1),
               "test_MDE": float(tot[1]) / max(n_samples, 1),
               "n_batches": n, "n_samples": n_samples}
    logger = MetricsLogger(cfg.checkpoint_dir, name="test",
                           tensorboard=cfg.tensorboard)
    logger.log(results)
    logger.text(f"Test loss: {results['test_loss']:.4f}  "
                f"Test MDE (m): {results['test_MDE']:.4f}")
    logger.close()
    return results
