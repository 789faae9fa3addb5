"""Shift-FMA depthwise 3x3 (stride 1) with a hand-written VJP — the
lane-starved-decoder form.

Motivation (r3 train-step trace, tools/tpu_profile.py --what train --raw,
batch 64): the decoder's small-channel depthwise convs (8-40 channels at
128x240) make XLA assign batch-minor layouts to their operands, inserting
~1.3-1.6 ms transposing copies around every such conv in forward AND
backward, plus [3,3,1,C] weight-grad mega-reductions (~13 ms/step).  A
depthwise 3x3 written as 9 shifted multiply-adds keeps the native C-minor
layout end to end, so those copies never exist.  Isolated timings
(tools/exp_dw_train.py, bf16, random cotangent):

    shape                      lax fwd   shift fwd   lax f+b   shift f+b
    [64,128,240,32]             3.83       2.99        9.30      11.75*
    [64,256,480,8]              4.03       3.26        8.43      12.54*
    [64,128,240,8]              1.97       1.86        5.37       5.98*
    [64,128,240,40]             4.67       3.97        9.67      14.39*

(*) = jax-autodiff backward of the shift form (slice adjoints become
scatter-adds into the padded buffer).  The custom VJP here replaces that
with the mirror-image shift form: dx = 9 shift-FMAs of the padded
cotangent with the flipped kernel; dw = 9 per-tap multiply-reduces that
XLA fuses into few passes over (x, g).  Whole-step A/B decides the default
(see grouped_conv.py SHIFT_DW_MAX_C); r2's rejected slice-reduce VJP
(grouped_conv.py header) differed in keeping lax's conv FORWARD — the
batch-minor copies stayed, so the reduce passes were pure overhead.

Semantics: torch Conv2d(C, C, 3, padding=1, groups=C), kernel [3, 3, 1, C]
(flax HWIO).  Taps accumulate in f32 by DEFAULT (matching the native conv
path's MXU accumulator; the result is cast back to the input dtype).
MSPL_SHIFT_DW_ACC_F32=0 switches to input-dtype accumulation (bf16 A/B
knob; measured no-win, BASELINE.md backward-roofline item 4).  The env var
is read ONCE at import time — set it before importing mspl_tpu.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp


_ACC_F32 = int(_os.environ.get("MSPL_SHIFT_DW_ACC_F32", "1"))


def _nine_shift_fma(xp: jnp.ndarray, w33c: jnp.ndarray, h: int, wd: int
                    ) -> jnp.ndarray:
    """xp: [B, H+2, W+2, C] zero-padded input; w33c: [3, 3, C].
    Returns [B, H, W, C] = depthwise 3x3 'same' in xp's dtype; taps
    accumulate in f32 (matching the native conv path's MXU accumulator,
    grouped_conv.py docstring).  MSPL_SHIFT_DW_ACC_F32=0 accumulates in the
    input dtype instead (A/B knob: halves the tap-chain register traffic
    under bf16 at the cost of 9-term bf16 accumulation error)."""
    acc = None
    acc_dt = jnp.float32 if _ACC_F32 else xp.dtype
    for ky in range(3):
        for kx in range(3):
            t = (xp[:, ky:ky + h, kx:kx + wd, :]
                 * w33c[ky, kx]).astype(acc_dt)
            acc = t if acc is None else acc + t
    return acc.astype(xp.dtype)


@jax.custom_vjp
def dw3x3_shift(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3, stride 1, 'same' zero padding; kernel [3, 3, 1, C]."""
    b, h, wd, c = x.shape
    w = kernel[:, :, 0, :].astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return _nine_shift_fma(xp, w, h, wd)


def _fwd(x, kernel):
    return dw3x3_shift(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    b, h, wd, c = x.shape
    w = kernel[:, :, 0, :].astype(g.dtype)
    # data grad: correlate the cotangent with the 180-degree-rotated kernel
    # — same 9-shift-FMA shape as the forward, no conv op, no relayout
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wr = w[::-1, ::-1]
    dx = _nine_shift_fma(gp, wr, h, wd).astype(x.dtype)
    # weight grad: dw[ky,kx,c] = sum_{b,h,w} xp[b, h+ky, w+kx, c] * g[...]
    # — 9 multiply-reduces sharing the same two operands; XLA multi-output
    # fuses them into few passes, all in the native C-minor layout
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    taps = [
        jnp.sum(xp[:, ky:ky + h, kx:kx + wd, :] * g32, axis=(0, 1, 2))
        for ky in range(3) for kx in range(3)
    ]
    dk = jnp.stack(taps).reshape(3, 3, 1, c).astype(kernel.dtype)
    return dx, dk


dw3x3_shift.defvjp(_fwd, _bwd)
