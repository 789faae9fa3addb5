from mspl_tpu.models.espnetv2 import (
    EESPNet,
    ESPNetv2Segmentation,
    eespnet_channel_plan,
)
from mspl_tpu.models.deeplab import DeepLabV3
from mspl_tpu.models.factory import build_segmentation_model, init_model

__all__ = [
    "EESPNet",
    "ESPNetv2Segmentation",
    "eespnet_channel_plan",
    "DeepLabV3",
    "build_segmentation_model",
    "init_model",
]
