"""Pallas TPU kernel: fused EESP branch stack — K parallel dilated depthwise
3x3 convs + hierarchical feature fusion in one VMEM-resident pass
(BASELINE.json:5: "the EESP dilated-depthwise conv blocks as Pallas kernels";
SURVEY.md §7 stage 7(a) and "Hard parts: Pallas dilated depthwise conv").

Motivation: under XLA each of the K branches is a separate depthwise conv
that re-reads the projected activation from HBM and writes its own output,
plus K-1 elementwise adds — ~2K+ passes over the tensor.  This kernel reads
the input once, computes all K branches as 9 shifted multiply-adds each
(VPU), applies the HFF cumulative adds in registers, and writes the
concatenated [.., K*n] output once.

Layout: NHWC, grid over the batch.  Stride-1 EESP units run at 1/8 and 1/16
resolution where a whole image plane fits VMEM comfortably (level3 of the
s=2.0 net at 480x256 input: (32+2d, 60+2d, 64) fp32 ≈ 0.7 MB in,
(1,32,60,256) ≈ 2 MB out), so each grid step takes one full (pre-padded)
image as its block and the halo problem disappears — shifted windows are
static in-VMEM slices.  (An earlier variant DMA'd overlapping row tiles from
an ANY-space ref; rank>=3 manual DMA reliably crashes this environment's TPU
compiler, and whole-plane blocks are faster anyway at these sizes.)

Stride-1 only (the strided EESP variant inside DownSampler runs 3 of ~13
units and keeps the lax path).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dilations: Tuple[int, ...], dmax: int, x_ref, w_ref, out_ref):
    """x block: [1, H+2*dmax, W+2*dmax, n]; w: [K*9, n];
    out block: [1, H, W, K*n]."""
    n = x_ref.shape[-1]
    h_out = out_ref.shape[1]
    w_out = out_ref.shape[2]
    acc = None
    for ki, d in enumerate(dilations):
        y = None
        for iy, dy in enumerate((-d, 0, d)):
            for ix, dx in enumerate((-d, 0, d)):
                tap = w_ref[ki * 9 + iy * 3 + ix, :]  # [n]
                win = x_ref[
                    0,
                    pl.ds(dmax + dy, h_out),
                    pl.ds(dmax + dx, w_out),
                    :,
                ]
                contrib = win * tap[None, None, :]
                y = contrib if y is None else y + contrib
        acc = y if acc is None else acc + y  # hierarchical feature fusion
        out_ref[0, :, :, ki * n:(ki + 1) * n] = acc


def eesp_branches_pallas(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    dilations: Sequence[int],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused K-branch dilated depthwise 3x3 + HFF.

    x: [B, H, W, n]; weights: [K, 3, 3, n] (per-channel taps, no bias);
    dilations: K ints (branch k uses dilation dilations[k]).
    Returns [B, H, W, K*n] = concat over k of cumsum_k(dwconv_k(x)).
    Matches the lax path: per-branch conv padding = dilation (SAME for 3x3).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, n = x.shape
    k = len(dilations)
    if weights.shape != (k, 3, 3, n):
        raise ValueError(f"weights {weights.shape} != {(k, 3, 3, n)}")
    dmax = int(max(dilations))

    xp = jnp.pad(x, ((0, 0), (dmax, dmax), (dmax, dmax), (0, 0)))
    w_flat = weights.reshape(k * 9, n).astype(x.dtype)

    kernel = partial(_kernel, tuple(int(d) for d in dilations), dmax)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * dmax, w + 2 * dmax, n),
                         lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * 9, n), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, k * n), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, k * n), x.dtype),
        interpret=interpret,
    )(xp, w_flat)
    return out
