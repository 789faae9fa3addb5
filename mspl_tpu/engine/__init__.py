from mspl_tpu.engine.losses import compute_class_weights, segmentation_loss
from mspl_tpu.engine.metrics import MIOU, confusion_matrix, iou_from_confusion
from mspl_tpu.engine.schedules import build_schedule

__all__ = [
    "segmentation_loss",
    "compute_class_weights",
    "confusion_matrix",
    "iou_from_confusion",
    "MIOU",
    "build_schedule",
]
