"""Grouped / depthwise 2-D convolution, TPU-fast formulation.

Why this module exists: on the current TPU XLA stack,
``lax.conv_general_dilated`` with ``feature_group_count > 1`` lowers to a
catastrophically slow program for the shapes this framework cares about
(measured on a v5e chip, batch 128, bf16):

    depthwise 3x3, 256x480xC9,  dilation 1:  130 ms   (shift form:  8.6 ms)
    depthwise 3x3, 128x240xC32, dilation 1:   99 ms   (shift form:  7.2 ms)
    grouped  1x1, 128x240, 128->32,  G=4:     98 ms   (einsum form: 9.2 ms)
    grouped  3x3, 128x240, 45->9,    G=9:    117 ms   (shift form: 18.5 ms)
    depthwise 3x3, 128x240xC32, dilation 4:  6.7 ms   (shift form:  7.3 ms)

ESPNetv2 is almost entirely grouped/depthwise convolutions (SURVEY.md §2
"Conv primitives"/"EESP unit").  What ships here, picked by whole-model A/B
on the v5e (ESPNetv2-s2.0 fwd, batch 128, 256x480, bf16):

* grouped (non-depthwise) conv -> **dense conv with a block-diagonal
  kernel**: wastes a factor-G of MXU-riding FLOPs but takes XLA's fast
  dense-conv path with clean layouts (whole fwd 157 -> 133 ms).  r2
  re-check (tools/exp_grouped_1x1.py): per-group lane-slice dots + concat
  (4x fewer MXU FLOPs, exact) measure 5.39 vs 5.44 ms on the stage4 chain
  and 5.89 vs 5.74 on stage3 — the stages are HBM-bound under XLA, so the
  densification FLOPs are free; densify stays;
* depthwise conv -> native ``lax.conv_general_dilated``: inside a jitted
  model XLA's depthwise lowering fuses well; hand-written shifted-tap
  multiply-accumulate loses whole-model (179 ms) despite winning isolated;
* depthwise 1x1 -> a plain channel scale (elementwise multiply).

Numerics: the block-diagonal form is the same convolution (extra terms are
exact zeros); verified against ``lax.conv_general_dilated`` with
feature_group_count in tests/test_grouped_conv.py.

Semantics match ``torch.nn.Conv2d(..., groups=G, padding=d*(k-1)//2,
dilation=d, stride=s)`` == the reference's `CBR/CB/C/CDilated` wrappers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[int, int]

# When False, grouped (non-depthwise) convs lower with the native
# feature_group_count path instead of block-diagonal densification.  The
# native path is far slower to EXECUTE on this stack (see header), but its
# XLA cost analysis counts only useful FLOPs — utils/profiling.estimate_flops
# flips this during lowering (never execution) so model cards don't
# overstate grouped-layer FLOPs by the group factor.
DENSIFY_GROUPED = True

# Depthwise 3x3/s1/d1 convs with at most this many channels route through
# the shift-FMA form (ops/dw_shift.py) instead of the native conv; 0
# disables.  Whole-step A/B at batch 64 (tools/bench_train.py, r3):
# threshold 0 -> 163.7 ms, 16 -> 152.2/153.8 ms (the P=8/16 pyrpool merge
# dws win 10-11 ms), 32 -> 173.2 ms, 64 -> 177.1 ms (the 32-40 ch decoder
# dws LOSE — enough lanes that the native conv's copies beat 9 f32
# shift-FMA passes).  Default 16; env override MSPL_SHIFT_DW_MAX_C for A/B.
import os as _os

SHIFT_DW_MAX_C = int(_os.environ.get("MSPL_SHIFT_DW_MAX_C", "16"))

# Dense (and densified-grouped) 3x3/s1/d1 convs with max(Cin, Cout) at most
# this route through the 9-shifted-matmul form (ops/conv_tapdot.py) instead
# of lax's native conv; 0 disables (the default — measured negative
# result).  The idea: the decoder's 24-40 channel convs pay batch-minor
# layout copies fwd+bwd plus reduce-scan weight grads under the native
# lowering (r3 train trace), and a tap-dot form stays C-minor with an MXU
# weight grad.  Whole-step A/B at batch 64: threshold 48 -> 165.4 ms vs
# 152.2-153.8 ms with the native conv — the 9+9+9 separate streamed dot
# passes (fwd/dx/dw each re-read their operands per tap; XLA does not fuse
# across dots) cost more HBM traffic than the copies they remove.  Kept
# parity-tested (tests/test_grouped_conv.py) as the recorded experiment.
TAPDOT_MAX_C = int(_os.environ.get("MSPL_TAPDOT_MAX_C", "0"))


def _route_tapdot(x, kernel, stride, dilation, ph, pw):
    kh, kw = kernel.shape[:2]
    return (TAPDOT_MAX_C and kh == kw == 3 and stride == (1, 1)
            and dilation == (1, 1) and (ph, pw) == (1, 1)
            and max(kernel.shape[2], kernel.shape[3]) <= TAPDOT_MAX_C)


def _out_size(size: int, pad: int, k: int, stride: int, dilation: int) -> int:
    eff = dilation * (k - 1) + 1
    return (size + 2 * pad - eff) // stride + 1


def grouped_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: Pair = (1, 1),
    dilation: Pair = (1, 1),
    groups: int = 1,
    padding: Pair | None = None,
) -> jnp.ndarray:
    """NHWC grouped conv with HWIO kernel [kh, kw, Cin/G, Cout].

    ``padding=None`` means torch-style 'same-ish' symmetric padding
    ``d*(k-1)//2`` per spatial dim (the only padding the reference uses).
    Output dtype follows ``x.dtype``; tap accumulation is fp32.
    """
    kh, kw, cin_g, cout = kernel.shape
    b, h, w, cin = x.shape
    if groups == 1:
        pad = padding if padding is not None else (
            dilation[0] * (kh - 1) // 2, dilation[1] * (kw - 1) // 2)
        if _route_tapdot(x, kernel, stride, dilation, *pad):
            from mspl_tpu.ops.conv_tapdot import conv3x3_tapdot

            return conv3x3_tapdot(x, kernel)
        # dense convs take XLA's fast native path
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), stride,
            [(pad[0], pad[0]), (pad[1], pad[1])], rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if cin_g * groups != cin or cout % groups:
        raise ValueError(
            f"bad grouped conv: x C={cin}, kernel I={cin_g}, groups={groups}, "
            f"Cout={cout}")
    cout_g = cout // groups
    kernel = kernel.astype(x.dtype)
    ph, pw = padding if padding is not None else (
        dilation[0] * (kh - 1) // 2, dilation[1] * (kw - 1) // 2)
    depthwise = cin_g == 1 and cout_g == 1

    if not depthwise and not DENSIFY_GROUPED:
        return jax.lax.conv_general_dilated(
            x, kernel, stride, [(ph, ph), (pw, pw)], rhs_dilation=dilation,
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if not depthwise:
        # Densify: grouped conv == dense conv with a block-diagonal kernel.
        # Wastes a factor-G of (cheap, MXU-riding) FLOPs but takes XLA's
        # fast dense-conv path with clean layouts; at this model's channel
        # widths that beats per-group einsums by a wide margin on TPU.
        # HWIO grouped kernel: O dim is ordered (G, Cout/G); group g maps
        # input block g -> output block g.
        kg = kernel.reshape(kh, kw, cin_g, groups, cout_g)
        eye = jnp.eye(groups, dtype=kernel.dtype)
        dense = jnp.einsum("hwigo,gG->hwGigo", kg, eye)
        dense = dense.reshape(kh, kw, cin, cout)
        if _route_tapdot(x, dense, stride, dilation, ph, pw):
            from mspl_tpu.ops.conv_tapdot import conv3x3_tapdot

            return conv3x3_tapdot(x, dense)
        return jax.lax.conv_general_dilated(
            x, dense, stride, [(ph, ph), (pw, pw)], rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if kh == kw == 1 and stride == (1, 1) and (ph, pw) == (0, 0):
        return (x * kernel[0, 0, 0, :]).astype(x.dtype)

    # Small-channel depthwise 3x3 (the decoder's lane-starved shapes, <=
    # SHIFT_DW_MAX_C channels): shift-FMA form with a hand-written VJP
    # (ops/dw_shift.py).  The native conv makes XLA batch-minor the
    # operands, paying ~1.3-1.6 ms transposing copies per conv fwd AND bwd
    # at [64,128,240,32] (r3 train trace); the shift form stays C-minor.
    # The whole-step A/B (threshold sweep in the SHIFT_DW_MAX_C comment
    # above) put the crossover between 16 and 32 channels; wide depthwise
    # (the EESP branches, C>=128) keeps the native lowering — whole-model
    # A/B measured shift-tap LOSING there (fwd 133 -> 179 ms).
    if (SHIFT_DW_MAX_C and kh == kw == 3 and stride == (1, 1)
            and dilation == (1, 1) and (ph, pw) == (1, 1)
            and cin <= SHIFT_DW_MAX_C):
        from mspl_tpu.ops.dw_shift import dw3x3_shift

        return dw3x3_shift(x, kernel)

    # Depthwise k x k: inside a jitted model XLA's native depthwise lowering
    # fuses well and beats a hand-written shifted-tap multiply-accumulate
    # (measured: full fwd 133 ms native vs 179 ms shift-tap at batch 128).
    # The pathological timings in the header are for *isolated* depthwise
    # ops, which get unlucky standalone layouts.
    #
    # Rejected (r2): a custom VJP computing the depthwise WEIGHT grad as
    # kh*kw strided-slice multiply-reduces while KEEPING lax's conv forward
    # (so the batch-minor copies stayed and the reduce passes were pure
    # overhead): packed train step 189.3 ms vs 163.7 ms at batch 64.  The
    # r3 shift form above replaces forward AND backward together.
    return jax.lax.conv_general_dilated(
        x, kernel, stride, [(ph, ph), (pw, pw)], rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def depthwise_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Depthwise 3x3 with torch 'same' padding; kernel [3, 3, 1, C].

    Thin wrapper used by the EESP branch stack (mspl_tpu/layers/eesp.py).
    """
    return grouped_conv2d(
        x, kernel, stride=(stride, stride), dilation=(dilation, dilation),
        groups=x.shape[-1],
    )
