"""Pallas TPU kernel: fused EESP branch stack — K parallel dilated depthwise
3x3 convs + hierarchical feature fusion in one VMEM-resident pass
(BASELINE.json:5: "the EESP dilated-depthwise conv blocks as Pallas kernels";
SURVEY.md §7 stage 7(a) and "Hard parts: Pallas dilated depthwise conv").

Motivation: under XLA each of the K branches is a separate depthwise conv
that re-reads the projected activation from HBM and writes its own output,
plus K-1 elementwise adds — ~2K+ passes over the tensor.  This kernel reads
the input once (with a dilation-sized halo), computes all K branches as
9 shifted multiply-adds each (VPU), applies the HFF cumulative adds in
registers, and writes the concatenated [.., K*n] output once.

Layout: NHWC, grid over (batch, H-tiles).  The input stays in HBM
(memory_space ANY); each grid step DMAs a [TILE_H + 2*Dmax, W + 2*Dmax, n]
window into VMEM scratch (halo rows/cols included — overlapping windows are
why this is a manual DMA rather than a BlockSpec).  The wrapper pre-pads W
and H by Dmax so the kernel never branches on boundaries.

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

TILE_H = 8


def _kernel(dilations: Tuple[int, ...], dmax: int, tile_h: int,
            x_hbm_ref, w_ref, out_ref, scratch, sem):
    """x_hbm: [B, Hpad, Wpad, n] (pre-padded, full array in HBM); w: [K*9, n];
    out block: [1, TILE_H, W, K*n]; scratch: [TILE_H+2*dmax, Wpad, n].
    grid = (B, Hpad // TILE_H): batch is a grid dim (vmapping an ANY-space
    ref is unsupported by the Mosaic lowering)."""
    b = pl.program_id(0)
    h_idx = pl.program_id(1)
    row0 = h_idx * tile_h  # top of this tile in padded coords

    copy = pltpu.make_async_copy(
        x_hbm_ref.at[b, pl.ds(row0, tile_h + 2 * dmax)], scratch, sem
    )
    copy.start()
    copy.wait()

    n = scratch.shape[-1]
    w_out = out_ref.shape[2]
    acc = None
    for ki, d in enumerate(dilations):
        y = None
        for iy, dy in enumerate((-d, 0, d)):
            for ix, dx in enumerate((-d, 0, d)):
                tap = w_ref[ki * 9 + iy * 3 + ix, :]  # [n]
                win = scratch[
                    pl.ds(dmax + dy, tile_h),
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

    h_pad = -(-h // TILE_H) * TILE_H
    xp = jnp.pad(
        x, ((0, 0), (dmax, dmax + (h_pad - h)), (dmax, dmax), (0, 0))
    )
    wpad = xp.shape[2]
    w_flat = weights.reshape(k * 9, n).astype(x.dtype)

    grid = (b, h_pad // TILE_H)
    kernel = partial(_kernel, tuple(int(d) for d in dilations), dmax, TILE_H)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
            pl.BlockSpec((k * 9, n), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, w, k * n),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w, k * n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * dmax, wpad, n), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_flat)
    return out[:, :h]
