"""Pallas TPU kernel: fused DownSampler front — K strided dilated depthwise
branches + HFF and the parallel 3x3/s2 average pool, one VMEM pass per image.

The first DownSampler (level2_0: 128x240 spatial, 32 channels) costs ~12 ms
of the 124 ms bench batch under XLA: its strided dilated depthwise convs
(5 ms), the avg pool (1.8 ms) and the grouped 1x1s all run at 25% lane
occupancy in NHWC (C=32 of 128 lanes).  This kernel runs the branch stack
and the pool channel-major with W as lanes.

Mosaic notes (discovered by probing this environment's remote compiler):
- strided slicing (`x[::2]`) fails to lower -> stride-2 is expressed as a
  full-resolution tap accumulation followed by TWO selection-matrix dots
  (one-hot rows at even indices); the 3x3/s2 avg pool is the same trick
  with 1/3-band matrices (separable, count_include_pad=True is exact);
- dots run in the input dtype with f32 accumulation (f32xf32 MXU is slow);
- tap scalars are extracted from f32 arrays (32-bit squeeze rule).

Forward-only kernel with a custom VJP whose backward differentiates the jnp
reference, so it is usable inside the train step (same pattern as
mspl_tpu/ops/pallas_pyrpool.py).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mspl_tpu.ops.grouped_conv import depthwise_conv3x3


@lru_cache(maxsize=None)
def _select_even(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] one-hot selection of even indices (stride-2 subsample)."""
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), 2 * np.arange(out_size)] = 1.0
    return m


@lru_cache(maxsize=None)
def _avg3_s2(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] separable 1/3-band of torch AvgPool2d(3,2,1,
    count_include_pad=True): row i averages indices {2i-1, 2i, 2i+1} with
    weight 1/3 each (out-of-range taps contribute zero)."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        for j in (2 * i - 1, 2 * i, 2 * i + 1):
            if 0 <= j < in_size:
                m[i, j] = 1.0 / 3.0
    return m


def _kernel(dilations, h, w, h2, w2, cx, cp,
            x_ref, proj_ref, w_ref, ph_ref, pw_ref, sh_ref, sw_ref,
            pool_ref, br_ref):
    """One (image, channel-chunk) per grid step: whole-image channel loops
    exceed the 16 MB VMEM scope by 2.7 MB, and a per-channel grid drowns in
    per-step overhead (measured 269 img/s).  cx/cp = pool/proj channels per
    chunk."""
    cdt = x_ref.dtype
    taps = w_ref[:].astype(jnp.float32)  # [cp, K, 9] (this chunk)
    ph = ph_ref[:]
    pw = pw_ref[:]
    sh = sh_ref[:]
    sw = sw_ref[:]

    def dot(a, b):
        return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

    for c in range(cx):
        plane = x_ref[0, c, :, :]
        y = dot(ph, plane)      # [H2, W]
        y = dot(y, pw)          # [H2, W2]
        pool_ref[0, c, :, :] = y.astype(pool_ref.dtype)

    dmax = max(dilations)
    for c in range(cp):
        plane = proj_ref[0, c, :, :]
        padded = jnp.pad(plane, ((dmax, dmax), (dmax, dmax)))
        hff = None
        for ki, d in enumerate(dilations):
            acc = None
            for iy in range(3):
                for ix in range(3):
                    tap = taps[c, ki, iy * 3 + ix].astype(cdt)
                    win = padded[dmax + (iy - 1) * d:dmax + (iy - 1) * d + h,
                                 dmax + (ix - 1) * d:dmax + (ix - 1) * d + w]
                    t = win * tap
                    acc = t if acc is None else acc + t
            sub = dot(sh, acc)   # [H2, W]
            sub = dot(sub, sw)   # [H2, W2]
            hff = sub if hff is None else hff + sub
            br_ref[0, c, ki, :, :] = hff.astype(br_ref.dtype)


def _jnp_reference(x, proj, dw_weights, dilations):
    """lax reference: strided dilated dw branches + HFF concat, avg pool."""
    from flax import linen as nn

    pool = nn.avg_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), count_include_pad=True)
    branches = []
    for ki, d in enumerate(dilations):
        b = depthwise_conv3x3(proj, dw_weights[ki][:, :, None, :],
                              stride=2, dilation=d)
        if ki > 0:
            b = b + branches[-1]
        branches.append(b)
    return pool, jnp.concatenate(branches, axis=-1)


def _impl(x, proj, dw_weights, dilations, interpret=False):
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, nin = x.shape
    n = proj.shape[-1]
    k_n = len(dilations)
    h2, w2 = (h - 1) // 2 + 1, (w - 1) // 2 + 1

    xp = jnp.transpose(x, (0, 3, 1, 2))
    pp = jnp.transpose(proj, (0, 3, 1, 2))
    # per-channel taps, channel-leading: [n, K, 9]
    wk = jnp.transpose(dw_weights.reshape(k_n, 9, n).astype(jnp.float32),
                       (2, 0, 1))
    mats = [jnp.asarray(_avg3_s2(h2, h)), jnp.asarray(_avg3_s2(w2, w).T),
            jnp.asarray(_select_even(h2, h)),
            jnp.asarray(_select_even(w2, w).T)]

    # channel chunks: enough to fit VMEM, few enough to amortize per-step
    # overhead (2 chunks suffice at the sizes this model hits)
    chunks = 2 if max(nin, n) >= 8 and nin % 2 == 0 and n % 2 == 0 else 1
    cx, cp = nin // chunks, n // chunks
    full = lambda s: pl.BlockSpec(s, lambda i, c: (0,) * len(s))
    pool, br5 = pl.pallas_call(
        partial(_kernel, tuple(dilations), h, w, h2, w2, cx, cp),
        grid=(b, chunks),
        in_specs=[
            pl.BlockSpec((1, cx, h, w), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, cp, h, w), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((cp, k_n, 9), lambda i, c: (c, 0, 0)),
            *[full(m.shape) for m in mats],
        ],
        out_specs=[
            pl.BlockSpec((1, cx, h2, w2), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, cp, k_n, h2, w2),
                         lambda i, c: (i, c, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nin, h2, w2), x.dtype),
            jax.ShapeDtypeStruct((b, n, k_n, h2, w2), proj.dtype),
        ],
        interpret=interpret,
    )(xp, pp, wk, *mats)
    # [B, n, K, H2, W2] -> NHWC with channel order ki*n + c (concat over ki)
    br = jnp.transpose(br5, (0, 2, 1, 3, 4)).reshape(b, k_n * n, h2, w2)
    return (jnp.transpose(pool, (0, 2, 3, 1)),
            jnp.transpose(br, (0, 2, 3, 1)))


@lru_cache(maxsize=None)
def _with_vjp(dilations: Tuple[int, ...]):
    @jax.custom_vjp
    def f(x, proj, wts):
        return _impl(x, proj, wts, dilations)

    def fwd(x, proj, wts):
        return f(x, proj, wts), (x, proj, wts)

    def bwd(res, g):
        x, proj, wts = res
        _, vjp = jax.vjp(
            lambda a, b, c: _jnp_reference(a, b, c, dilations), x, proj, wts)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def down_front_pallas(
    x: jnp.ndarray,
    proj: jnp.ndarray,
    dw_weights: jnp.ndarray,
    dilations: Sequence[int],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused DownSampler front.

    x: [B,H,W,nin] block input (avg-pool path); proj: [B,H,W,n] projected
    activation; dw_weights: [K,3,3,n].  Returns
    (pool [B,H2,W2,nin], branches_with_HFF [B,H2,W2,K*n]) matching the lax
    path (depthwise stride-2 dilation-d convs with padding d, cumulative
    HFF adds, torch AvgPool2d(3,2,1)).
    """
    if interpret:
        return _impl(x, proj, dw_weights, tuple(dilations), interpret=True)
    return _with_vjp(tuple(dilations))(x, proj, dw_weights)
