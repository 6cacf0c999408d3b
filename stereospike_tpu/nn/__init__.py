"""Neural-net layers and blocks (functional, NHWC/HWIO TPU-native layouts)."""

from stereospike_tpu.nn.layers import (  # noqa: F401
    conv2d,
    conv_init,
    nearest_upsample,
    bilinear_resize,
    upsample_conv,
)
from stereospike_tpu.nn.blocks import (  # noqa: F401
    init_conv_block,
    init_upsample_block,
    init_sew_block,
    init_ann_res_block,
    sew_block_apply,
    ann_res_block_apply,
    connect,
)
