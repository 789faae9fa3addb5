from mspl_tpu.data.label_space import (
    GREENHOUSE_IGNORE,
    label_conversion_lut,
    label_conversion_matrix,
    convert_label_map,
)
from mspl_tpu.data.datasets import (
    CamVidSegmentation,
    CityscapesSegmentation,
    FreiburgForestSegmentation,
    GreenhouseRGBD,
    SyntheticSegmentation,
    build_dataset,
)
from mspl_tpu.data.loader import DataLoader
from mspl_tpu.data.transforms import (
    eval_transform,
    normalize,
    train_transform,
)

__all__ = [
    "GREENHOUSE_IGNORE",
    "label_conversion_lut",
    "label_conversion_matrix",
    "convert_label_map",
    "CamVidSegmentation",
    "CityscapesSegmentation",
    "FreiburgForestSegmentation",
    "GreenhouseRGBD",
    "SyntheticSegmentation",
    "build_dataset",
    "DataLoader",
    "normalize",
    "train_transform",
    "eval_transform",
]
