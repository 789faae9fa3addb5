"""mspl_tpu — TPU-native multi-source pseudo-label segmentation framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference ShigemichiMatsuzaki/MSPL (unsupervised domain adaptation of semantic
segmentation via multi-source pseudo-label self-training).  The design
blueprint is /root/repo/SURVEY.md; the reference checkout was empty at build
time (SURVEY.md §0), so reference citations in this package point at the
survey's layer map (SURVEY.md §1-§3) and algorithm appendix (SURVEY.md App. A)
rather than at reference file:line.

Subpackages
-----------
layers    : Flax NN building blocks (CBR/CB/C, CDilated, EESP, DownSampler,
            EfficientPyrPool) — reference layer L1 (SURVEY.md §1).
models    : ESPNetv2 classification/segmentation + DeepLab-family alternative
            — reference layer L2.
data      : dataset registry, device-side transform pipeline, label-space
            LUT converters — reference layer L3.
engine    : losses, mIoU metric, LR schedules, train/eval loops, checkpoints
            — reference layer L4.
pseudo    : the pseudo-label engine (softmax → label-space conversion →
            soft/hard fusion → class-balanced thresholding) and the
            self-training orchestrator — reference layers L5/L6.
ops       : TPU compute primitives: matmul-based bilinear resize and the
            Pallas kernels for the fused pseudo-label pass and the fused
            EESP dilated-depthwise stack.
parallel  : device-mesh / sharding helpers (DP over `data`, source-model
            parallelism over `model`).
utils     : printing, registries, configs, checkpoint IO, TB logging.
"""

__version__ = "0.1.0"
