"""Named model configurations mirroring the reference model zoo.

Each factory returns a :class:`StereoSpikeConfig`; build with
``init_params(key, cfg)`` / run with ``forward``.
"""

from __future__ import annotations

from stereospike_tpu.models.stereospike import StereoSpikeConfig


def stereospike(**overrides) -> StereoSpikeConfig:
    """Flagship binocular fully-IF model (reference ``StereoSpike``,
    SNN_models.py:63; built in train.py:118 with the ATan surrogate)."""
    return StereoSpikeConfig(**overrides)


def stereospike_tempo(use_plif: bool = True, tau: float = 3.0,
                      multiply_factor: float = 10.0, **overrides) -> StereoSpikeConfig:
    """LIF/PLIF variant used for the paper experiments (reference
    ``fromZero_feedforward_multiscale_tempo_Matt_SpikeFlowNetLike``,
    SNN_models.py:251; paper settings tau=3.0, multiply_factor=10.0)."""
    return StereoSpikeConfig(
        neuron="plif" if use_plif else "lif",
        tau=tau,
        multiply_factor=multiply_factor,
        sew_neuron="plif",  # reference passes use_plif=True to SEW blocks
        **overrides,
    )


def stereospike_monocular(use_plif: bool = True, tau: float = 3.0,
                          multiply_factor: float = 10.0, **overrides) -> StereoSpikeConfig:
    """Monocular (single-DVS, 2-channel) variant (SNN_models.py:438).

    ``in_channels`` may be overridden (the driver passes the per-step
    channel count for nfpdm/chunk stacking, train/loop.py::_in_channels)."""
    overrides.setdefault("in_channels", 2)
    return StereoSpikeConfig(
        neuron="plif" if use_plif else "lif",
        tau=tau,
        multiply_factor=multiply_factor,
        sew_neuron="plif",
        **overrides,
    )


def stereospike_noskip(use_plif: bool = False, tau: float = 3.0,
                       multiply_factor: float = 10.0, **overrides) -> StereoSpikeConfig:
    """Skip-connection ablation (SNN_models.py:629; SEW neurons follow
    ``use_plif`` here, unlike the tempo variant)."""
    return StereoSpikeConfig(
        neuron="plif" if use_plif else "lif",
        tau=tau,
        multiply_factor=multiply_factor,
        sew_neuron="plif" if use_plif else "lif",
        use_skips=False,
        **overrides,
    )


def stereospike_cutpredict(use_plif: bool = False, tau: float = 3.0,
                           multiply_factor: float = 10.0, **overrides) -> StereoSpikeConfig:
    """Deepest-prediction-head ablation (SNN_models.py:767): no head at
    scale 4, returns [depth1, depth2, depth3]."""
    return StereoSpikeConfig(
        neuron="plif" if use_plif else "lif",
        tau=tau,
        multiply_factor=multiply_factor,
        sew_neuron="plif" if use_plif else "lif",
        heads=(1, 2, 3),
        **overrides,
    )
