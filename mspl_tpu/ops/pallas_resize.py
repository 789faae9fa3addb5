"""Pallas TPU kernel: channel-major bilinear upsample for the final logits
resize (ESPNetv2Segmentation's last op before the fused pseudo pass).

The einsum formulation (ops/resize.py::resize_bilinear_cm) is already
matmul-based, but XLA schedules the H-contraction with a strided operand
layout and materializes a relayout copy of the full-resolution logits
(~1.6 ms of `copy.*` per model in the device trace).  This kernel does the
same two interpolation contractions per image with explicit layouts:

  grid = (B, H_out / h_blk); per step, per channel: H-dot
  [h_blk, H_in] x [H_in, W_in] (the H-matrix row-block is selected by the
  grid index), channels concatenated into one [C*h_blk, W_in] stack, then
  ONE batched W-dot [C*h_blk, W_in] x [W_in, W_out] -> the output block.

Pure MXU work — no shifts, no masks.  Numerics: bf16 operands with f32
accumulation, identical to the einsum path's `_mm` convention.  Falls back
to the einsum path for shapes whose output-H block rows would need
misaligned input windows (only exact x2 with H_in % 8 == 0 is accepted) or
on CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mspl_tpu.ops.resize import _interp_matrix, resize_bilinear_cm


def _kernel(c, h_in, w_in, w_out, h_blk, x_ref, uh_ref, uw_ref, out_ref):
    """x [1, C, H_in, W_in]; uh [1, h_blk, H_in] (this output block's rows
    of the H interpolation matrix); uw [W_in, W_out]; out [1, C, h_blk,
    W_out]."""
    cdt = x_ref.dtype
    uh = uh_ref[0]

    def dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32
                           ).astype(cdt)

    rows = jnp.concatenate(
        [dot(uh, x_ref[0, ch]) for ch in range(c)], axis=0)  # [C*h_blk, Wi]
    up = dot(rows, uw_ref[:])                                # [C*h_blk, Wo]
    for ch in range(c):
        out_ref[0, ch] = up[ch * h_blk:(ch + 1) * h_blk, :]


def resize_x2_cm_pallas(
    x: jnp.ndarray,
    size_hw: Tuple[int, int],
    align_corners: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear resize on channel-major [B, C, H, W] input (same contract
    as resize_bilinear_cm); Pallas path for the production x2 logits shape,
    einsum fallback otherwise."""
    b, c, h_in, w_in = x.shape
    h_out, w_out = size_hw
    h_blk = h_in  # one output block = h_in rows (x2: two blocks)
    if (h_out % h_blk or h_in % 8 or w_out < w_in
            or not jnp.issubdtype(x.dtype, jnp.floating)):
        return resize_bilinear_cm(x, size_hw, align_corners)
    if jax.default_backend() == "cpu" and not interpret:
        # fast einsum path for production CPU; tests pass interpret=True to
        # exercise the kernel logic itself
        return resize_bilinear_cm(x, size_hw, align_corners)

    mdt = x.dtype
    uh = _interp_matrix(h_in, h_out, align_corners)          # [Ho, Hi]
    n_blk = h_out // h_blk
    uh_blocks = jnp.asarray(
        uh.reshape(n_blk, h_blk, h_in), mdt)                 # [n, hb, Hi]
    uw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners).T, mdt)

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    return pl.pallas_call(
        partial(_kernel, c, h_in, w_in, w_out, h_blk),
        grid=(b, n_blk),
        in_specs=[
            pl.BlockSpec((1, c, h_in, w_in), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_blk, h_in), lambda i, j: (j, 0, 0)),
            full(uw.shape),
        ],
        out_specs=pl.BlockSpec((1, c, h_blk, w_out),
                               lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, h_out, w_out), x.dtype),
        interpret=interpret,
    )(x, uh_blocks, uw)
