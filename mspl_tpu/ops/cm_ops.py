"""Channel-major [B, C, H, W] decoder primitives for the TRAIN path.

VERDICT r3 item 4: the b64 train-step trace pins ~24.9 ms/step on
{3,1,2,0}<->{0,3,2,1} transposing copies that XLA inserts around the
decoder's lane-starved NHWC convs (24-40 channels at 128x240 — it
batch-minors their operands), plus ~19.8 ms of per-channel convert+reduce
fusions in the CBR backwards (BASELINE.md "backward roofline").  The eval
pipeline already proved channel-major layouts win exactly these shapes
(the whole-plane Pallas kernel family, ops/pallas_pyrpool.py).  These
functions express every decoder op directly on [B, C, H, W] so the native
W-minor (lanes) / H (sublanes) tiling is the layout XLA compiles for and
the flip copies never exist:

* 1x1 convs are einsums contracting C (sublane-dim contraction — the
  moved bytes are layout-clean even when C < 128 underutilizes the MXU;
  decoder 1x1 FLOPs are tiny);
* dense/grouped 3x3 convs are 9-tap shifted einsums (tap-dot) on the
  zero-padded input — grouped kernels densify to block-diagonal exactly
  like ops/grouped_conv.py (same math, same FLOP waste trade);
* depthwise 3x3 is the 9-tap shift-FMA of ops/dw_shift.py re-expressed on
  trailing spatial dims (shifts along W are lane rotations, along H
  sublane shifts — both native VPU moves);
* resizes/pools ride the existing trailing-dim matmuls
  (ops/resize.resize_bilinear_cm + the CM adaptive pool here).

Gradients flow through jax autodiff: every op here is built from static
slices / pads / einsums whose adjoints stay in the same CM layout (the
NHWC shift form needed a custom VJP because XLA's batch-minor choice made
the autodiff adjoints scatter-adds; in CM the pad/slice adjoints are
plain trailing-dim pads).  Whole-step A/B vs the NHWC decoder decides the
default — see BASELINE.md "backward roofline" r4 entry.

Tap accumulation is fp32 (matching the MXU accumulator of the native conv
path and ops/dw_shift.py's default); outputs keep the input dtype.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def cm_conv1x1(x: jnp.ndarray, kernel: jnp.ndarray, groups: int = 1,
               bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """1x1 conv on [B, C, H, W].  kernel: HWIO [1, 1, Cin/G, Cout]."""
    k = kernel[0, 0].astype(x.dtype)  # [Cin/G, Cout]
    b, c, h, w = x.shape
    if groups == 1:
        out = jnp.einsum("io,bihw->bohw", k, x)
    else:
        cin_g = c // groups
        cout_g = k.shape[1] // groups
        kg = k.reshape(cin_g, groups, cout_g)  # O ordered (G, Cout/G)
        xg = x.reshape(b, groups, cin_g, h, w)
        out = jnp.einsum("igo,bgihw->bgohw", kg, xg)
        out = out.reshape(b, groups * cout_g, h, w)
    if bias is not None:
        out = out + bias.astype(out.dtype)[:, None, None]
    return out


def cm_dw3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 'same' (stride 1) on [B, C, H, W].
    kernel: HWIO [3, 3, 1, C] (flax shape, shared with the NHWC path)."""
    b, c, h, w = x.shape
    k = kernel[:, :, 0, :].astype(x.dtype)  # [3, 3, C]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = None
    for ky in range(3):
        for kx in range(3):
            t = (xp[:, :, ky:ky + h, kx:kx + w]
                 * k[ky, kx][:, None, None]).astype(jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def cm_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
               groups: int = 1) -> jnp.ndarray:
    """Dense or grouped 3x3 'same' (stride 1, dilation 1) on [B, C, H, W]
    as 9 shifted tap-dots.  kernel: HWIO [3, 3, Cin/G, Cout]; grouped
    kernels densify to block-diagonal (ops/grouped_conv.py trade)."""
    kh, kw, cin_g, cout = kernel.shape
    assert kh == kw == 3, kernel.shape
    b, c, h, w = x.shape
    if cin_g == 1 and cout == c == groups:
        return cm_dw3x3(x, kernel)
    k = kernel.astype(x.dtype)
    if groups > 1:
        cout_g = cout // groups
        kg = k.reshape(3, 3, cin_g, groups, cout_g)
        eye = jnp.eye(groups, dtype=k.dtype)
        k = jnp.einsum("hwigo,gG->hwGigo", kg, eye).reshape(3, 3, c, cout)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = None
    for ky in range(3):
        for kx in range(3):
            t = jnp.einsum(
                "io,bihw->bohw", k[ky, kx],
                xp[:, :, ky:ky + h, kx:kx + w]).astype(jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def channel_shuffle_cm(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Reference `Shuffle` on [B, C, H, W]: [g, c/g] -> [c/g, g]."""
    b, c, h, w = x.shape
    x = x.reshape(b, groups, c // groups, h, w)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(b, c, h, w)


@lru_cache(maxsize=None)
def _adaptive_mat(in_size: int, out_size: int) -> np.ndarray:
    from mspl_tpu.ops.resize import _adaptive_avg_matrix

    return _adaptive_avg_matrix(in_size, out_size)


def adaptive_avg_pool_cm(x: jnp.ndarray,
                         size_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch adaptive_avg_pool2d on [B, C, H, W] (trailing-dim matmuls)."""
    _, _, h_in, w_in = x.shape
    h_out, w_out = size_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    if h_in != h_out:
        m = jnp.asarray(_adaptive_mat(h_in, h_out), x.dtype)
        x = jnp.einsum("oh,bchw->bcow", m, x)
    if w_in != w_out:
        m = jnp.asarray(_adaptive_mat(w_in, w_out), x.dtype)
        x = jnp.einsum("ow,bchw->bcho", m, x)
    return x


def pyr_branches_cm(x: jnp.ndarray, weights: jnp.ndarray,
                    scales: Sequence[float]) -> jnp.ndarray:
    """The EfficientPyrPool branch stack on [B, C, H, W]: per scale,
    resample -> depthwise 3x3 -> resample back; concat on C (scale-major,
    matching pyr_branches_jnp's channel order).  weights: [S, 3, 3, P]."""
    from mspl_tpu.ops.pallas_pyrpool import _branch_sizes
    from mspl_tpu.ops.resize import resize_bilinear_cm

    b, p, h, w = x.shape
    branches = []
    for i, s in enumerate(scales):
        hs, ws = _branch_sizes(h, w, (s,))[0]
        if s < 1.0:
            y = adaptive_avg_pool_cm(x, (hs, ws))
        elif s > 1.0:
            y = resize_bilinear_cm(x, (hs, ws), align_corners=True)
        else:
            y = x
        y = cm_dw3x3(y, weights[i][:, :, None, :].astype(y.dtype))
        if s != 1.0:
            y = resize_bilinear_cm(y, (h, w), align_corners=True)
        branches.append(y)
    return jnp.concatenate(branches, axis=1)
