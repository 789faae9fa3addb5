from mspl_tpu.layers.conv_blocks import BR, C, CB, CBR, CDilated, PReLU
from mspl_tpu.layers.eesp import EESP, DownSampler
from mspl_tpu.layers.pyramid_pool import EfficientPWC, EfficientPyrPool, channel_shuffle

__all__ = [
    "EfficientPWC",
    "channel_shuffle",
    "PReLU",
    "C",
    "CB",
    "CBR",
    "BR",
    "CDilated",
    "EESP",
    "DownSampler",
    "EfficientPyrPool",
]
