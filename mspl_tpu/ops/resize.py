"""Bilinear / nearest image resize as TPU-friendly matmuls and gathers.

The reference resizes with PIL (data layer) and `F.interpolate` bilinear
`align_corners=True` (decoder upsampling) — SURVEY.md §7 "Resize parity" calls
out that the convention must be pinned explicitly because pseudo-label quality
flows through it.  We therefore implement resize ourselves instead of using
`jax.image.resize`:

* bilinear resize is expressed as two small dense interpolation matrices
  applied along H and W (`einsum`), which XLA maps onto the MXU — far faster
  than gather-based resize on TPU, and supports both `align_corners`
  conventions exactly;
* nearest resize (labels) is a static gather with the floor convention used
  by `F.interpolate(mode="nearest")`.

Interpolation matrices are built with numpy at trace time (shapes are static
under jit) and folded into the compiled program as constants.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] linear-interpolation matrix."""
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = o * ((in_size - 1) / (out_size - 1)) if out_size > 1 else np.zeros_like(o)
    else:
        src = (o + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] += 1.0 - w_hi
    mat[np.arange(out_size), hi] += w_hi
    return mat.astype(np.float32)


@lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    # floor convention of F.interpolate(mode="nearest")
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(idx, 0, in_size - 1).astype(np.int32)



def _mm(eq: str, mat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Resize einsum in the data dtype with f32 accumulation.

    Low-precision inputs (bf16 models) keep their dtype through the matmul —
    f32xf32 on the MXU runs at a fraction of bf16 rate — while fp32 inputs
    (parity tests, label-quality-critical paths) stay exactly fp32."""
    mat = jnp.asarray(mat)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.einsum(eq, mat, x.astype(jnp.float32)).astype(x.dtype)
    if x.dtype == jnp.float32:
        return jnp.einsum(eq, mat, x)
    return jnp.einsum(eq, mat.astype(x.dtype), x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def resize_bilinear(
    x: jnp.ndarray,
    size_hw: Tuple[int, int],
    align_corners: bool = True,
    order: str = "hw",
) -> jnp.ndarray:
    """Bilinearly resize NHWC (or HWC) `x` to spatial `size_hw` = (H, W).

    `align_corners=True` matches the reference decoder's
    `F.interpolate(..., mode="bilinear", align_corners=True)`;
    `align_corners=False` is the half-pixel convention.  `order` picks
    which spatial contraction runs first ("hw" or "wh") — mathematically
    identical (separable linear ops commute; fp differences are at
    rounding level), but the resulting XLA layouts differ and some call
    sites avoid a relayout copy with the swapped order.
    """
    if order not in ("hw", "wh"):
        raise ValueError(f"order must be 'hw' or 'wh', got {order!r}")
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if x.ndim != 4:
        raise ValueError(f"expected NHWC or HWC input, got shape {x.shape}")
    _, h_in, w_in, _ = x.shape
    h_out, w_out = size_hw
    if (h_in, w_in) == (h_out, w_out):
        return x[0] if squeeze else x
    xf = x
    steps = ("h", "w") if order == "hw" else ("w", "h")
    for dim in steps:
        if dim == "h" and h_in != h_out:
            xf = _mm("oh,bhwc->bowc",
                     _interp_matrix(h_in, h_out, align_corners), xf)
        elif dim == "w" and w_in != w_out:
            xf = _mm("ow,bhwc->bhoc",
                     _interp_matrix(w_in, w_out, align_corners), xf)
    return xf[0] if squeeze else xf


def resize_bilinear_to_cm(
    x: jnp.ndarray,
    size_hw: Tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear resize NHWC -> CHANNEL-MAJOR [B, C, H', W'].

    The H-resize einsum writes a fresh tensor anyway, so emitting it in
    channel-major order folds the layout change into the resize for free —
    used when the consumer (the fused pseudo-label kernel,
    mspl_tpu/ops/pallas_pseudo_cm.py) wants W as the TPU lane dimension.
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    _, h_in, w_in, _ = x.shape
    h_out, w_out = size_hw
    xf = x
    if h_in != h_out:
        xf = _mm("oh,bhwc->bcow", _interp_matrix(h_in, h_out, align_corners), xf)
    else:
        xf = jnp.transpose(xf, (0, 3, 1, 2))
    if w_in != w_out:
        xf = _mm("ow,bchw->bcho", _interp_matrix(w_in, w_out, align_corners), xf)
    return xf


def resize_bilinear_cm(
    x: jnp.ndarray,
    size_hw: Tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear resize on CHANNEL-MAJOR [B, C, H, W] input, staying
    channel-major (consumes the fused pyramid-pool kernel's layout)."""
    if x.ndim != 4:
        raise ValueError(f"expected BCHW input, got shape {x.shape}")
    _, _, h_in, w_in = x.shape
    h_out, w_out = size_hw
    xf = x
    if h_in != h_out:
        xf = _mm("oh,bchw->bcow", _interp_matrix(h_in, h_out, align_corners), xf)
    if w_in != w_out:
        xf = _mm("ow,bchw->bcho", _interp_matrix(w_in, w_out, align_corners), xf)
    return xf


@lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] matrix implementing torch adaptive_avg_pool1d bin semantics:
    bin i averages input [floor(i*I/O), ceil((i+1)*I/O))."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        lo = (o * in_size) // out_size
        hi = -((-(o + 1) * in_size) // out_size)  # ceil
        mat[o, lo:hi] = 1.0 / (hi - lo)
    return mat.astype(np.float32)


def adaptive_avg_pool(x: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.adaptive_avg_pool2d`` on NHWC input, as two small matmuls."""
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got {x.shape}")
    _, h_in, w_in, _ = x.shape
    h_out, w_out = size_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    xf = x
    if h_in != h_out:
        xf = _mm("oh,bhwc->bowc", _adaptive_avg_matrix(h_in, h_out), xf)
    if w_in != w_out:
        xf = _mm("ow,bhwc->bhoc", _adaptive_avg_matrix(w_in, w_out), xf)
    return xf


def resize_nearest(x: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize for label maps.

    Accepts NHW / HW integer label maps or NHWC feature maps; resizes the two
    spatial dims (the last two for label maps, middle two for NHWC).
    """
    h_out, w_out = size_hw
    if x.ndim in (2, 3):  # HW or NHW label maps
        h_in, w_in = x.shape[-2], x.shape[-1]
        if (h_in, w_in) == (h_out, w_out):
            return x
        hi = jnp.asarray(_nearest_index(h_in, h_out))
        wi = jnp.asarray(_nearest_index(w_in, w_out))
        x = jnp.take(x, hi, axis=-2)
        return jnp.take(x, wi, axis=-1)
    if x.ndim == 4:  # NHWC
        h_in, w_in = x.shape[1], x.shape[2]
        if (h_in, w_in) == (h_out, w_out):
            return x
        hi = jnp.asarray(_nearest_index(h_in, h_out))
        wi = jnp.asarray(_nearest_index(w_in, w_out))
        x = jnp.take(x, hi, axis=1)
        return jnp.take(x, wi, axis=2)
    raise ValueError(f"unsupported rank for resize_nearest: {x.shape}")
