"""Model factory + init helpers (reference layer L2 public surface: model
constructors keyed by name, SURVEY.md §1 row L2)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mspl_tpu.models.deeplab import DeepLabV3
from mspl_tpu.models.espnetv2 import ESPNetv2Segmentation
from mspl_tpu.utils.registry import MODEL_NAMES


def build_segmentation_model(
    name: str,
    num_classes: int,
    s: float = 2.0,
    compute_dtype: Any = jnp.float32,
    **kwargs,
):
    """Construct a segmentation model by registry name ('espnetv2'/'deeplabv3')."""
    if name == "espnetv2":
        return ESPNetv2Segmentation(
            num_classes=num_classes, s=s, compute_dtype=compute_dtype, **kwargs
        )
    if name == "deeplabv3":
        return DeepLabV3(num_classes=num_classes, compute_dtype=compute_dtype, **kwargs)
    raise ValueError(f"unknown model '{name}'; supported: {MODEL_NAMES}")


def init_model(
    model,
    input_hw: Tuple[int, int],
    rng: Optional[jax.Array] = None,
    batch: int = 1,
    channels: int = 3,
) -> Dict[str, Any]:
    """Initialize model variables ({'params', 'batch_stats'}) on a dummy batch."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((batch, input_hw[0], input_hw[1], channels), jnp.float32)
    # jit the init: eager init executes the model op-by-op on the device
    # (minutes over a remote-TPU tunnel); jitted it is one compiled program
    init_fn = jax.jit(lambda r, d: model.init({"params": r}, d, train=False))
    return init_fn(rng, dummy)
