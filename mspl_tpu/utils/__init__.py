from mspl_tpu.utils.print_utils import (
    print_error_message,
    print_info_message,
    print_log_message,
    print_warning_message,
)
from mspl_tpu.utils.registry import (
    DATASET_INFO,
    MODEL_NAMES,
    SCHEDULER_NAMES,
    SEGMENTATION_DATASETS,
    dataset_info,
)

__all__ = [
    "print_info_message",
    "print_log_message",
    "print_warning_message",
    "print_error_message",
    "DATASET_INFO",
    "MODEL_NAMES",
    "SCHEDULER_NAMES",
    "SEGMENTATION_DATASETS",
    "dataset_info",
]
