"""mIoU metric (reference `utilities/metrics/segmentation_miou.py`,
SURVEY.md §2 "mIoU metric": confusion-matrix accumulation → per-class IoU →
mean, ignoring 255).

TPU-native: the per-batch confusion matrix is a one-hot scatter-add computed
on device inside the jitted eval step (it reduces over the `data` mesh axis
automatically under GSPMD, SURVEY.md §5 "metrics computed on-device ... as a
psum-reduced array"); only the accumulated [C, C] matrix crosses to the host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mspl_tpu.utils.registry import IGNORE_LABEL


def confusion_matrix(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    ignore_label: int = IGNORE_LABEL,
    batch_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Device-side confusion matrix.  pred/label: [...spatial] int arrays.
    Returns float32 [num_classes, num_classes]; rows = ground truth."""
    valid = label != ignore_label
    if batch_mask is not None:
        valid = valid & batch_mask.reshape(
            batch_mask.shape + (1,) * (label.ndim - batch_mask.ndim)
        )
    l = jnp.where(valid, label, 0).astype(jnp.int32)
    p = jnp.clip(pred, 0, num_classes - 1).astype(jnp.int32)
    flat = (l * num_classes + p).reshape(-1)
    wts = valid.astype(jnp.float32).reshape(-1)
    cm = jnp.zeros((num_classes * num_classes,), jnp.float32)
    cm = cm.at[flat].add(wts)
    return cm.reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray) -> Tuple[np.ndarray, float]:
    """Per-class IoU + mean over classes that appear (nan-safe)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / denom, np.nan)
    miou = float(np.nanmean(iou)) if np.isfinite(iou).any() else 0.0
    return iou.astype(np.float32), miou


class MIOU:
    """Streaming accumulator mirroring the reference's `MIOU.get_iou()`."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.cm = np.zeros((num_classes, num_classes), np.float64)

    def update(self, cm_batch) -> None:
        self.cm += np.asarray(cm_batch, np.float64)

    def update_preds(self, pred, label, batch_mask=None) -> None:
        self.update(confusion_matrix(jnp.asarray(pred), jnp.asarray(label),
                                     self.num_classes, batch_mask=batch_mask))

    def get_iou(self) -> Tuple[np.ndarray, float]:
        return iou_from_confusion(self.cm)

    def reset(self) -> None:
        self.cm[:] = 0
