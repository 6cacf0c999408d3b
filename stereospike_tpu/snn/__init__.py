"""Functional spiking-neuron primitives (TPU-native SpikingJelly replacement)."""

from stereospike_tpu.snn.surrogate import (  # noqa: F401
    spike_atan,
    spike_sigmoid,
    make_spike_fn,
)
from stereospike_tpu.snn.neurons import (  # noqa: F401
    if_step,
    lif_step,
    plif_step,
    plif_w_from_tau,
    plif_tau_from_w,
    integrator_step,
)
