"""Pseudo-label PNG IO and colorized visualization (reference L5 disk
boundary: "save pseudo-label PNG per image (+ colorized viz); append to
pseudo-label train list", SURVEY.md §3.2).

On TPU the label tensors stay device-resident inside a self-training round
(BASELINE.json:5); these writers exist for round-level checkpointing (the
label set on disk restarts a round, SURVEY.md §5 "Checkpoint / resume"), for
interop with reference-format file lists, and for visual inspection.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from mspl_tpu.utils.registry import IGNORE_LABEL

# distinct colors for greenhouse classes: plant, artificial, ground (+ignore)
GREENHOUSE_PALETTE = np.asarray(
    [(0, 255, 0), (0, 0, 255), (255, 255, 0)], np.uint8
)


def save_label_png(label: np.ndarray, path: str) -> None:
    """Save an integer label map (255=ignore) as an 8-bit grayscale PNG.

    Uses the native C++ encoder (native/mspl_io.cc) when the library is
    built — the path `cmd_pseudo` and self-training round dumps hit per
    image — with a PIL fallback."""
    from mspl_tpu.data.native_io import encode_png

    encode_png(path, label.astype(np.uint8))


def load_label_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im, np.uint8)


def colorize_label(
    label: np.ndarray,
    palette: np.ndarray = GREENHOUSE_PALETTE,
    ignore_color: Tuple[int, int, int] = (0, 0, 0),
) -> np.ndarray:
    """Integer label map → RGB viz (uint8 [H,W,3])."""
    table = np.zeros((256, 3), np.uint8)
    table[: palette.shape[0]] = palette
    table[IGNORE_LABEL] = ignore_color
    return table[label.astype(np.int32)]


def save_colorized_png(label: np.ndarray, path: str,
                       palette: np.ndarray = GREENHOUSE_PALETTE) -> None:
    from mspl_tpu.data.native_io import encode_png

    encode_png(path, colorize_label(label, palette))


def write_train_list(
    list_path: str,
    image_paths: Sequence[str],
    label_paths: Sequence[str],
) -> None:
    """Write a reference-format `image label` list file."""
    os.makedirs(os.path.dirname(list_path) or ".", exist_ok=True)
    with open(list_path, "w") as f:
        for img, lab in zip(image_paths, label_paths):
            f.write(f"{img} {lab}\n")
