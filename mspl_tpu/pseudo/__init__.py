from mspl_tpu.pseudo.generate import (
    PseudoLabelGenerator,
    SourceModel,
    fused_pseudo_pass,
    generate_pseudo_labels,
    make_source,
)
from mspl_tpu.pseudo.cbst import (
    class_confidence_histograms,
    kc_from_histograms,
)
from mspl_tpu.pseudo.self_training import SelfTrainConfig, self_training

__all__ = [
    "SourceModel",
    "make_source",
    "fused_pseudo_pass",
    "generate_pseudo_labels",
    "PseudoLabelGenerator",
    "class_confidence_histograms",
    "kc_from_histograms",
    "SelfTrainConfig",
    "self_training",
]
