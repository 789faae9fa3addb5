"""Pallas TPU kernel: fused EfficientPyrPool branch stack.

The pyramid-pool decoder (SURVEY.md §2 "Efficient pyramid pool") runs, per
scale s in {2.0, 1.5, 1.0, 0.5, 0.1}: resample the projected feature map to
s, depthwise 3x3, resample back, then concatenates the five branches.  Its
projected width is tiny (8-16 channels, = max(num_classes//2, 8) capped at
16), so under XLA every one of those ops is a lane-starved (C of 128 lanes)
pass over tensors up to FULL input resolution (the 2.0-scale branch of the
last decoder stage), each with its own layout copy.  Profiling the s=2.0
ESPNetv2 forward at batch 128 x 256x480 put the LAST pyramid pool alone at
26 ms/iter — equal to the entire encoder (28.5 ms).

This kernel computes the whole 5-branch stack in one VMEM-resident pass per
image with W as the lane dimension (240/480 wide = full lanes):

  grid = (B,); block = the image's projected plane [P, H, W] (channel-major)
  per channel (static loop, P <= 16):
    per scale: resize = two small 2-D MXU dots with the SAME interpolation /
    adaptive-avg matrices the jnp path uses (mspl_tpu/ops/resize.py), the
    depthwise 3x3 = 9 statically shifted multiply-adds on a zero-padded
    VMEM buffer, resize back = two more dots.

Numerics match the jnp path op-for-op: fp32 resize matrices, fp32 dot
accumulation, taps summed in fp32, output cast to the input dtype.

Whole-plane blocks, no manual DMA, grid length = batch — the patterns this
environment's remote TPU compiler is known to handle (see
mspl_tpu/ops/pallas_eesp.py header for the constraints discovered there).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mspl_tpu.ops.resize import _adaptive_avg_matrix, _interp_matrix


def _branch_sizes(h: int, w: int, scales: Sequence[float]) -> Tuple[Tuple[int, int], ...]:
    return tuple(
        (max(int(math.ceil(h * s)), 5), max(int(math.ceil(w * s)), 5))
        for s in scales
    )


def _dw3x3_same(plane: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """3x3 depthwise ('same', zero pad) on a 2-D [h, w] plane; taps [9]."""
    h, w = plane.shape
    padded = jnp.pad(plane, ((1, 1), (1, 1)))
    acc = None
    for iy in range(3):
        for ix in range(3):
            tap = taps[iy * 3 + ix]
            win = padded[iy:iy + h, ix:ix + w]
            t = win * tap
            acc = t if acc is None else acc + t
    return acc


def _kernel(scales, sizes, h, w, p, x_ref, w_ref, *mat_refs_and_out):
    mat_refs = mat_refs_and_out[:-1]
    out_ref = mat_refs_and_out[-1]
    taps_all = w_ref[:].astype(jnp.float32)  # [S, 9, P]

    mi = 0
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s == 1.0:
            down_h = down_w = up_h = up_w = None
        else:
            down_h = mat_refs[mi][:]      # [hs, H]
            down_w = mat_refs[mi + 1][:]  # [W, ws]
            up_h = mat_refs[mi + 2][:]    # [H, hs]
            up_w = mat_refs[mi + 3][:]    # [ws, W]
            mi += 4
        for c in range(p):
            plane = x_ref[0, c, :, :].astype(jnp.float32)  # [H, W]
            if s != 1.0:
                y = jax.lax.dot(down_h, plane,
                                preferred_element_type=jnp.float32)  # [hs, W]
                y = jax.lax.dot(y, down_w,
                                preferred_element_type=jnp.float32)  # [hs, ws]
            else:
                y = plane
            y = _dw3x3_same(y, taps_all[si, :, c])
            if s != 1.0:
                y = jax.lax.dot(up_h, y,
                                preferred_element_type=jnp.float32)  # [H, ws]
                y = jax.lax.dot(y, up_w,
                                preferred_element_type=jnp.float32)  # [H, W]
            out_ref[0, si * p + c, :, :] = y.astype(out_ref.dtype)


def pyr_branches_pallas(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused pyramid-pool branch stack.

    x: [B, H, W, P] projected features; weights: [S, 3, 3, P] depthwise taps
    (branch si uses weights[si]); scales: S floats, sorted as the caller's
    branch order.  Returns [B, H, W, S*P] = concat over si of
    resample_back(dw3x3(resample_to_scale(x))), matching the jnp path in
    mspl_tpu/layers/pyramid_pool.py (adaptive-avg down / bilinear
    align_corners=True up, bilinear back).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, p = x.shape
    s_n = len(scales)
    if weights.shape != (s_n, 3, 3, p):
        raise ValueError(f"weights {weights.shape} != {(s_n, 3, 3, p)}")
    sizes = _branch_sizes(h, w, scales)

    # interpolation operators, identical to the jnp path's
    mats = []
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s == 1.0:
            continue
        if s < 1.0:
            dh = _adaptive_avg_matrix(h, hs)
            dw_ = _adaptive_avg_matrix(w, ws)
        else:
            dh = _interp_matrix(h, hs, True)
            dw_ = _interp_matrix(w, ws, True)
        uh = _interp_matrix(hs, h, True)
        uw = _interp_matrix(ws, w, True)
        mats += [jnp.asarray(dh), jnp.asarray(dw_.T),
                 jnp.asarray(uh), jnp.asarray(uw.T)]

    xp = jnp.transpose(x, (0, 3, 1, 2))  # [B, P, H, W]
    wk = weights.reshape(s_n, 9, p)

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        partial(_kernel, tuple(scales), sizes, h, w, p),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, h, w), lambda i: (i, 0, 0, 0)),
            full(wk.shape),
            *[full(m.shape) for m in mats],
        ],
        out_specs=pl.BlockSpec((1, s_n * p, h, w), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_n * p, h, w), x.dtype),
        interpret=interpret,
    )(xp, wk, *mats)
    return jnp.transpose(out, (0, 2, 3, 1))  # [B, H, W, S*P]
