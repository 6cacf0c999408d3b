"""Training configuration.

Replaces the reference's edit-in-place module constants
(``/root/reference/train.py:60-68``, ``test.py:36-40``) with a dataclass
that the CLI parses from flags / JSON.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # model: a factory name in models.factory (stereospike, stereospike_tempo,
    # stereospike_monocular, stereospike_noskip, stereospike_cutpredict) or an
    # equivalent-ANN baseline (ann, ann_sigmoid, ann_tanh, ann_leaky_relu —
    # reference ANN_models.py:28, paper Table 4)
    model: str = "stereospike"
    in_hw: Tuple[int, int] = (260, 346)
    # None = use the model factory's default (e.g. the tempo variant's paper
    # value 10.0); setting a value overrides it for any model
    multiply_factor: Optional[float] = None
    tau: float = 3.0
    use_plif: bool = True
    # prediction-head scales (paper Table 2 ablation: {1,2,3,4} → {1});
    # None = the factory's default (all four; (1,2,3) for cutpredict)
    heads: Optional[Tuple[int, ...]] = None

    # data (reference train.py:60-68)
    # 'mvsec' (stereo hdf5, the reference's training dataset) or 'dense'
    # (monocular CARLA .npy tree, reference dense_dataset.py — loader-only
    # there; trainable end-to-end here with a contiguous train/val/test
    # split, data/dense.py::split_dense)
    dataset: str = "mvsec"
    nfpdm: int = 1                    # frames per depth map (dt = 50/nfpdm ms)
    n_inference: int = 1              # chunks per training sample
    n_warmup: int = 1                 # no-grad warmup chunks (stateful models)
    batch_size: int = 1
    learn_on: str = "LIN"             # LIN | LOG | DISP
    scenario: str = "indoor_flying"
    split: str = "1"
    data_root: str = "./datasets/MVSEC/data/"
    # bound the dataset build's event memory: stream the hdf5 events table
    # in blocks of this many rows through the C++ rectify+bin accumulator
    # (None = materialize the full table, the reference's behavior)
    event_block_rows: Optional[int] = None
    normalize: bool = False
    # TensorBoard event files next to the JSONL sink (train.py:173,272-273,
    # 344-345); auto-disabled when the tensorboard package is absent
    tensorboard: bool = True
    # --synthetic fixture sizing (data/fixtures.py::make_mvsec_fixture):
    # depth frames + events per sequence, and whether the generated scene is
    # learnable (event density + stereo disparity correlated with depth) —
    # lets the driver run hardware-sized end-to-end training demonstrations
    # when the multi-GB MVSEC hdf5 files are not present
    synth_frames: int = 16
    synth_events: int = 30000
    synth_learnable: bool = False
    # the reference composes hflip/vflip/time-mirror/event-drop into every
    # training run (data_augmentation.py:166-172, train.py:84-90)
    augment: bool = True

    # optimization (train.py:126-128)
    learning_rate: float = 2e-4
    weight_decay: float = 0.0
    epochs: int = 70
    lr_milestones: Tuple[int, ...] = (8, 42, 60)
    lr_gamma: float = 0.5

    # loss (loss.py:119)
    loss_alpha: float = 0.5
    scale_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    penalize_spikes: bool = False
    loss_beta: float = 1.0

    # execution
    # T axis of each batch: the n_inference chunks of a sample are spread
    # over n_timesteps scan steps (must divide n_inference), channel-stacking
    # n_inference/n_timesteps chunks per step. 1 = the reference's layout
    # (everything channel-stacked, single timestep; train.py:200-218).
    n_timesteps: int = 1
    # layer-major multistep path (models/multistep.py) instead of the
    # step-major lax.scan: every conv batches over B·T merged samples and
    # each neuron site runs a statically-unrolled T-step recurrence in the
    # conv's native layout — the fast path for n_timesteps > 1 (~1.4× the
    # scan) and the TPU analog of SpikingJelly's CUDA multi-step neurons
    # (README.md:42-44). The alternative fused Pallas recurrence kernels
    # exist (snn/pallas_kernels.py, use_pallas=True) but are not the
    # default: their custom-call relayouts cost more than the fusion saves
    # (models/multistep.py module docstring).
    multistep: bool = False
    # gradient accumulation: split each batch into accum_steps microbatches
    # walked by a lax.scan (one microbatch of activations live at a time) —
    # large effective batches on bounded HBM. Mean-of-microbatch-gradient
    # semantics (see train/steps.py:make_train_step)
    accum_steps: int = 1
    # staged input pipeline: a background worker preps (assembles, uploads,
    # augments, shards) up to this many batches ahead of the step in flight —
    # the TPU analog of the reference's DataLoader workers + pin_memory
    # (train.py:100). 0 = synchronous prep. Bit-identical to 0 by
    # construction (single worker preserves the augmentation key order).
    prefetch: int = 2
    # wire-compress the per-step H2D training upload (data/packing.py):
    # bit-packed bool masks (8x, lossless) + fp16 labels (2x, <=2^-11
    # relative — far below the sensor's depth noise), unpacked by one
    # jitted device op before augmentation/step. On upload-bound links
    # (production_loop_throughput.json: 73 MB/s tunnel, 2.2 s/batch) the
    # batch bytes ARE the steady-state interval, so fewer bytes is
    # throughput. Eval batches always upload exact f32 (metrics parity).
    pack_io: bool = True
    # no-grad warmup inference before the train chunks (train.py:223-228)
    use_warmup: bool = False
    # seed the depth integrators with the previous GT
    # (set_init_depths_potentials, SNN_models.py:247-248)
    use_init_pots: bool = False
    # save a 4-panel input/pred/GT/error PNG every N eval batches (0 = off;
    # reference train.py:234-235, test.py:153-154)
    save_viz: int = 0
    # log per-tap firing-rate densities (the reference's offline
    # calculate_firing_rates profile, SNN_models.py:194-245) into the
    # training JSONL every N epochs, measured on one validation batch
    # (0 = off) — training-time spike-activity observability
    log_firing_rates: int = 0

    # initialize model params from a reference-implementation .pth
    # checkpoint (torch state_dict, train.py:351) via interop.py — lets a
    # reference user bring their trained weights along
    import_pth: Optional[str] = None

    # runtime
    seed: int = 2021                  # train.py:53
    compute_dtype: str = "float32"    # or "bfloat16" for MXU-speed training
    checkpoint_dir: str = "./results/checkpoints"
    checkpoint_every: int = 0         # extra periodic full-state ckpt (0 = off)
    resume: bool = False
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, spatial); None = auto
    debug_nans: bool = False

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        d = json.loads(text)
        for key in ("in_hw", "lr_milestones", "scale_weights", "mesh_shape",
                    "heads"):
            if d.get(key) is not None:
                d[key] = tuple(d[key])
        return cls(**d)
