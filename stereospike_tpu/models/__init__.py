"""Model zoo: StereoSpike SNN family + equivalent ANN."""

from stereospike_tpu.models.stereospike import (  # noqa: F401
    StereoSpikeConfig,
    init_params,
    init_state,
    forward,
    forward_sequence,
    firing_rates,
    firing_rates_sequence,
    count_params,
    TAP_NAMES,
)
from stereospike_tpu.models.multistep import forward_multistep  # noqa: F401
from stereospike_tpu.models.factory import (  # noqa: F401
    stereospike,
    stereospike_tempo,
    stereospike_monocular,
    stereospike_noskip,
    stereospike_cutpredict,
)
from stereospike_tpu.models.ann import (  # noqa: F401
    AnnConfig,
    init_ann_params,
    init_ann_state,
    ann_forward,
)
