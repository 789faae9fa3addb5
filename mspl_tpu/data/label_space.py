"""Label-space converters: source dataset class ids → greenhouse target ids.

Reference component "Label-space converters" (SURVEY.md §2): static per-source
lookup tables mapping CamVid / Cityscapes / Freiburg-Forest class ids into the
greenhouse label space (plant / artificial object / ground + ignore), applied
to argmax maps or used to pool probabilities.

Greenhouse target space (SURVEY.md App. A "Greenhouse label space"):
    0 = plant, 1 = artificial_object, 2 = ground, 255 = ignore/background.
The survey flags the exact per-class assignments as medium confidence [C];
they are kept here as plain data tables so they can be re-derived against the
reference when it becomes readable.

Two representations are provided:

* `label_conversion_lut(src)` — int32 [num_src_classes] LUT for converting
  argmax label maps (hard fusion path);
* `label_conversion_matrix(src)` — float32 [num_src_classes, num_tgt+1]
  0/1 pooling matrix for converting per-pixel probability maps by summing the
  probability mass of all source classes that map to each target class (soft
  fusion path).  Expressing the conversion as a matrix makes the fused
  softmax→convert→average pass a pure matmul chain on TPU (MXU-friendly) —
  this is the representation the Pallas pseudo-label kernel consumes.
  Column `num_tgt` collects mass mapped to ignore.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Tuple

import numpy as np

GREENHOUSE_IGNORE = 255
GREENHOUSE_NUM_CLASSES = 3  # plant, artificial_object, ground

_PLANT, _ARTIFICIAL, _GROUND, _IGN = 0, 1, 2, GREENHOUSE_IGNORE

# CamVid 11-class order (see utils/registry.py):
# sky, building, pole, road, sidewalk, tree, sign, fence, car, pedestrian, bicyclist
CAMVID_TO_GREENHOUSE: Tuple[int, ...] = (
    _IGN,         # sky
    _ARTIFICIAL,  # building
    _ARTIFICIAL,  # pole
    _GROUND,      # road
    _GROUND,      # sidewalk
    _PLANT,       # tree
    _ARTIFICIAL,  # sign
    _ARTIFICIAL,  # fence
    _ARTIFICIAL,  # car
    _IGN,         # pedestrian
    _IGN,         # bicyclist
)

# Cityscapes 19 train-id order
CITYSCAPES_TO_GREENHOUSE: Tuple[int, ...] = (
    _GROUND,      # road
    _GROUND,      # sidewalk
    _ARTIFICIAL,  # building
    _ARTIFICIAL,  # wall
    _ARTIFICIAL,  # fence
    _ARTIFICIAL,  # pole
    _ARTIFICIAL,  # traffic light
    _ARTIFICIAL,  # traffic sign
    _PLANT,       # vegetation
    _GROUND,      # terrain
    _IGN,         # sky
    _IGN,         # person
    _IGN,         # rider
    _ARTIFICIAL,  # car
    _ARTIFICIAL,  # truck
    _ARTIFICIAL,  # bus
    _ARTIFICIAL,  # train
    _ARTIFICIAL,  # motorcycle
    _ARTIFICIAL,  # bicycle
)

# Freiburg Forest 5-class order: road, grass, vegetation, sky, obstacle
FOREST_TO_GREENHOUSE: Tuple[int, ...] = (
    _GROUND,      # road
    _GROUND,      # grass
    _PLANT,       # vegetation (incl. trees)
    _IGN,         # sky
    _ARTIFICIAL,  # obstacle
)

# identity map for when the target model itself participates in later
# self-training rounds (SURVEY.md §3.3)
GREENHOUSE_IDENTITY: Tuple[int, ...] = (_PLANT, _ARTIFICIAL, _GROUND)

_LUTS: Dict[str, Tuple[int, ...]] = {
    "camvid": CAMVID_TO_GREENHOUSE,
    "cityscapes": CITYSCAPES_TO_GREENHOUSE,
    "forest": FOREST_TO_GREENHOUSE,
    "greenhouse": GREENHOUSE_IDENTITY,
}

# Standard Cityscapes raw-id (0..33) → train-id (0..18 / 255) table, needed to
# read stock Cityscapes label PNGs (SURVEY.md §2 "Dataset: Cityscapes").
CITYSCAPES_ID_TO_TRAINID = np.full(256, 255, np.int32)
for _raw, _train in {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}.items():
    CITYSCAPES_ID_TO_TRAINID[_raw] = _train


def label_conversion_lut(src: str, num_target: int = GREENHOUSE_NUM_CLASSES) -> np.ndarray:
    """int32 LUT [num_src] mapping source class id → target id (ignore=255)."""
    if src not in _LUTS:
        raise ValueError(f"no label conversion from '{src}'; have {sorted(_LUTS)}")
    lut = np.asarray(_LUTS[src], np.int32)
    if not ((lut == GREENHOUSE_IGNORE) | (lut < num_target)).all():
        raise ValueError(f"LUT for {src} exceeds target space {num_target}")
    return lut


@lru_cache(maxsize=None)
def _conversion_matrix_cached(src: str, num_target: int) -> np.ndarray:
    lut = label_conversion_lut(src, num_target)
    mat = np.zeros((lut.shape[0], num_target + 1), np.float32)
    for s, t in enumerate(lut):
        mat[s, num_target if t == GREENHOUSE_IGNORE else t] = 1.0
    return mat


def label_conversion_matrix(src: str, num_target: int = GREENHOUSE_NUM_CLASSES) -> np.ndarray:
    """float32 [num_src, num_target+1] probability-pooling matrix; the last
    column accumulates mass that maps to ignore."""
    return _conversion_matrix_cached(src, num_target)


def convert_label_map(labels: np.ndarray, src: str) -> np.ndarray:
    """Convert an integer label map through the source→greenhouse LUT
    (ignore label 255 passes through)."""
    lut = label_conversion_lut(src)
    full = np.full(256, GREENHOUSE_IGNORE, np.int32)
    full[: lut.shape[0]] = lut
    return full[labels.astype(np.int32)]
