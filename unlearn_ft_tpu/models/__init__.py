from .unet_spec import (  # noqa: F401
    ResnetSpec,
    TransformerSpec,
    BlockSpec,
    UNetSpec,
    UNetConfig,
    build_unet_spec,
    gate_layout_for_config,
    materialize_pruned,
    sd21_unet_config,
    sdxl_unet_config,
)
from .unet import UNet2DConditionModel  # noqa: F401
