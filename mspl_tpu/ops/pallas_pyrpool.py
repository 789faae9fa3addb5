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
import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mspl_tpu.ops.resize import _adaptive_avg_matrix, _interp_matrix

# r3 experiment (VERDICT r2 item 7) — MEASURED NEGATIVE RESULT, default
# off: batch the per-scale merge depthwise convs of one kernel invocation
# into ONE _dw3x3_rows over a concatenated [S*R, w] plane stack.  The gap
# rows that isolate 3x3 halos between channel planes equally isolate the
# scale blocks, so the concat is exact (CPU parity 0 ulp).  Rationale was
# instruction-issue boundedness (docs/ENCODER_ROOFLINE.md): S separate
# merges cost S*(9 mul + 8 add + 5 shifts) whole-array ops vs (9+8+5)
# bigger ops + S concats + S-1 slice adds.  Measured (r3, v5e):
#   isolated v2 (o=11/19/5): 7.19/8.13/6.88 ms vs 7.71/8.14/6.59 baseline
#     (mixed, within the ~±0.4 ms tunnel noise)
#   whole pipeline: 1432.0 vs 1442.6 img/s same-day (−0.7%, noise-level)
#   v3 phase A at full P: holding 3 vf stacks live = 22.8 MB scoped VMEM >
#     16 MB hard limit (compile error) — the mode only fits v2/phase B.
# Conclusion: the merge dws were not issue-bound enough to pay for the
# concat copies; the element work dominates.  Kept behind the env flag as
# the recorded experiment.
STACK_MERGE = bool(int(os.environ.get("MSPL_STACK_MERGE", "0")))


def _branch_sizes(h: int, w: int, scales: Sequence[float]) -> Tuple[Tuple[int, int], ...]:
    return tuple(
        (max(int(math.ceil(h * s)), 5), max(int(math.ceil(w * s)), 5))
        for s in scales
    )


def _dw3x3_same(plane: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """3x3 depthwise ('same', zero pad) on a 2-D [h, w] plane; taps [9] f32
    (scalars are extracted in f32 — a Mosaic requirement — then cast to the
    plane dtype so bf16 planes stay bf16 on the VPU)."""
    h, w = plane.shape
    padded = jnp.pad(plane, ((1, 1), (1, 1)))
    acc = None
    for iy in range(3):
        for ix in range(3):
            tap = taps[iy * 3 + ix].astype(plane.dtype)
            win = padded[iy:iy + h, ix:ix + w]
            t = win * tap
            acc = t if acc is None else acc + t
    return acc


def _kernel(scales, sizes, h, w, p, x_ref, w_ref, *mat_refs_and_out):
    mat_refs = mat_refs_and_out[:-1]
    out_ref = mat_refs_and_out[-1]
    # compute in the input dtype (bf16 in production: f32xf32 MXU dots run
    # at a fraction of bf16 rate) with f32 dot accumulation; f32 inputs
    # (CPU parity tests) keep the exact old behavior
    cdt = x_ref.dtype
    # taps stay f32: Mosaic only squeezes 32-bit scalars out of arrays; the
    # per-tap scalar is cast to the compute dtype after extraction
    taps_all = w_ref[:].astype(jnp.float32)  # [S, 9, P]

    def dot(a, b):
        return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

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
            plane = x_ref[0, c, :, :]  # [H, W]
            if s != 1.0:
                y = dot(down_h, plane)   # [hs, W]
                y = dot(y, down_w)       # [hs, ws]
            else:
                y = plane
            y = _dw3x3_same(y, taps_all[si, :, c])
            if s != 1.0:
                y = dot(up_h, y)         # [H, ws]
                y = dot(y, up_w)         # [H, W]
            out_ref[0, si * p + c, :, :] = y.astype(out_ref.dtype)


def _prelu(x, alpha):
    return jnp.maximum(x, 0.0) + alpha * jnp.minimum(x, 0.0)


def pyr_branches_jnp(x: jnp.ndarray, weights: jnp.ndarray,
                     scales: Sequence[float]) -> jnp.ndarray:
    """jnp reference of the branch stack (shared by the CPU path, the
    kernel's parity tests, and the kernel's custom-VJP backward)."""
    from mspl_tpu.ops.grouped_conv import depthwise_conv3x3
    from mspl_tpu.ops.resize import adaptive_avg_pool, resize_bilinear

    b, h, w, p = x.shape
    branches = []
    for i, s in enumerate(scales):
        hs, ws = _branch_sizes(h, w, (s,))[0]
        if s < 1.0:
            y = adaptive_avg_pool(x, (hs, ws))
        elif s > 1.0:
            y = resize_bilinear(x, (hs, ws), align_corners=True)
        else:
            y = x
        y = depthwise_conv3x3(y, weights[i][:, :, None, :].astype(y.dtype))
        if s != 1.0:
            y = resize_bilinear(y, (h, w), align_corners=True)
        branches.append(y)
    return jnp.concatenate(branches, axis=-1)


def _fused_kernel(scales, sizes, h, w, p, o, x_ref, w_ref, aff1_ref, mw_ref,
                  aff2_ref, clsw_ref, tail_ref, *mats_out_scratch):
    """Whole EfficientPyrPool (minus proj), eval mode — one (image, channel)
    per grid step so the per-channel temporaries are allocated once (the
    channel-unrolled variant blew the 16 MB VMEM scope at 35 MB).

    Per step: compute the channel's 5 scale branches, post-concat
    BN-affine+PReLU, the (shuffled) grouped 3x3 merge taps with its
    BN-affine+PReLU, and accumulate the 1x1 classifier contribution into an
    f32 VMEM scratch; the last channel applies bias + last BN-affine+PReLU
    and writes the output block."""
    mat_refs = mats_out_scratch[:-2]
    out_ref = mats_out_scratch[-2]
    acc_ref = mats_out_scratch[-1]
    c = pl.program_id(1)

    cdt = x_ref.dtype
    # per-channel parameter packs stay f32 (32-bit scalar extraction);
    # plane math runs in the input dtype with f32 dot accumulation
    taps = w_ref[0].astype(jnp.float32)    # [S, 9] this channel's dw taps
    aff1 = aff1_ref[0].astype(jnp.float32)  # [3, S]
    mw = mw_ref[0].astype(jnp.float32)      # [S, 9]
    aff2 = aff2_ref[0, 0].astype(jnp.float32)  # [3]
    clsw = clsw_ref[0, 0].astype(jnp.float32)  # [O]

    def dot(a, b):
        return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

    mi = 0
    ops = []
    for si, s in enumerate(scales):
        if s == 1.0:
            ops.append(None)
        else:
            ops.append(tuple(mat_refs[mi + j][:] for j in range(4)))
            mi += 4

    plane = x_ref[0, 0, :, :]  # [H, W]
    merged = None
    for si, s in enumerate(scales):
        if ops[si] is None:
            y = plane
        else:
            down_h, down_w, up_h, up_w = ops[si]
            y = dot(down_h, plane)
            y = dot(y, down_w)
        y = _dw3x3_same(y, taps[si, :])
        if ops[si] is not None:
            down_h, down_w, up_h, up_w = ops[si]
            y = dot(up_h, y)
            y = dot(y, up_w)
        y = y.astype(jnp.float32)
        y = _prelu(y * aff1[0, si] + aff1[1, si], aff1[2, si])
        # shuffled grouped merge: group c sums dw3x3 over its S branches
        t = _dw3x3_same(y, mw[si, :])
        merged = t if merged is None else merged + t
    merged = _prelu(merged * aff2[0] + aff2[1], aff2[2])

    # scalar-broadcast loops: Mosaic rejects [O] -> [O,1,1] shape casts, so
    # the classifier/tail run per output plane with scalar weights
    @pl.when(c == 0)
    def _init():
        for oc in range(o):
            acc_ref[oc] = merged * clsw[oc]

    @pl.when(c > 0)
    def _accum():
        for oc in range(o):
            acc_ref[oc] += merged * clsw[oc]

    @pl.when(c == p - 1)
    def _flush():
        tail = tail_ref[:].astype(jnp.float32)  # [4, O] bias, a3, b3, alpha3
        for oc in range(o):
            y = acc_ref[oc] + tail[0, oc]
            y = _prelu(y * tail[1, oc] + tail[2, oc], tail[3, oc])
            out_ref[0, oc] = y.astype(out_ref.dtype)


def pyr_pool_fused_eval(
    x: jnp.ndarray,
    dw_weights: jnp.ndarray,
    aff1: jnp.ndarray,
    merge_weights: jnp.ndarray,
    aff2: jnp.ndarray,
    cls_w: jnp.ndarray,
    cls_b: jnp.ndarray,
    aff3: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
    channel_major_out: bool = False,
) -> jnp.ndarray:
    """EfficientPyrPool minus the projection conv, fused, eval mode.

    x: [B, H, W, P] projected features.
    dw_weights: [S, 3, 3, P] branch depthwise taps.
    aff1: [3, S*P] post-concat BN-as-affine (scale, bias) + PReLU alpha, in
        concat channel order c = si*P + p.
    merge_weights: [3, 3, S, P] grouped merge kernel (HWIO of the reference
        CBR(groups=P) applied after channel_shuffle — group p consumes the
        S branches of channel p).
    aff2: [3, P] merge BN-affine + PReLU alpha.
    cls_w: [P, O] classifier 1x1; cls_b: [O] (zeros when the classifier has
        no bias).  aff3: [3, O] last BN-affine + PReLU alpha (identity rows
        (1, 0, 1) when last_layer_br=False).
    Returns [B, H, W, O].
    """
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, p = x.shape
    s_n = len(scales)
    o = cls_w.shape[1]
    if dw_weights.shape != (s_n, 3, 3, p):
        raise ValueError(f"dw_weights {dw_weights.shape} != {(s_n, 3, 3, p)}")
    if merge_weights.shape != (3, 3, s_n, p):
        raise ValueError(
            f"merge_weights {merge_weights.shape} != {(3, 3, s_n, p)}")
    sizes = _branch_sizes(h, w, scales)

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

    from jax.experimental.pallas import tpu as pltpu

    xp = jnp.transpose(x, (0, 3, 1, 2))  # [B, P, H, W]
    # channel-leading param packs: Pallas TPU requires the last two block
    # dims to cover the array (or be (8,128)-aligned), so the per-channel
    # block is always (1, <full trailing dims>)
    wk = jnp.transpose(dw_weights.reshape(s_n, 9, p), (2, 0, 1))  # [P, S, 9]
    aff1_r = jnp.transpose(aff1.reshape(3, s_n, p), (2, 0, 1))    # [P, 3, S]
    mwk = jnp.transpose(merge_weights.reshape(9, s_n, p), (2, 1, 0))  # [P,S,9]
    aff2_r = aff2.T[:, None, :]                                   # [P, 1, 3]
    clsw_r = cls_w[:, None, :]                                    # [P, 1, O]
    tail = jnp.concatenate([cls_b[None, :], aff3], axis=0)        # [4, O]

    full = lambda shape: pl.BlockSpec(shape, lambda i, c: (0,) * len(shape))
    out = pl.pallas_call(
        partial(_fused_kernel, tuple(scales), sizes, h, w, p, o),
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, s_n, 9), lambda i, c: (c, 0, 0)),
            pl.BlockSpec((1, 3, s_n), lambda i, c: (c, 0, 0)),
            pl.BlockSpec((1, s_n, 9), lambda i, c: (c, 0, 0)),
            pl.BlockSpec((1, 1, 3), lambda i, c: (c, 0, 0)),
            pl.BlockSpec((1, 1, o), lambda i, c: (c, 0, 0)),
            full(tail.shape),
            *[full(m.shape) for m in mats],
        ],
        out_specs=pl.BlockSpec((1, o, h, w), lambda i, c: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, o, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((o, h, w), jnp.float32)],
        interpret=interpret,
    )(xp, wk, aff1_r, mwk, aff2_r, clsw_r, tail, *mats)
    if channel_major_out:
        return out  # [B, O, H, W] — feeds the channel-major resize for free
    return jnp.transpose(out, (0, 2, 3, 1))  # [B, H, W, O]


def _shift2(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """shift2(x, dy, dx)[r, c] = x[r - dy, c - dx], zero-filled."""
    h, w = x.shape
    if dy:
        zr = jnp.zeros((abs(dy), w), x.dtype)
        x = (jnp.concatenate([zr, x[:h - dy]], axis=0) if dy > 0
             else jnp.concatenate([x[-dy:], zr], axis=0))
    if dx:
        zc = jnp.zeros((h, abs(dx)), x.dtype)
        x = (jnp.concatenate([zc, x[:, :w - dx]], axis=1) if dx > 0
             else jnp.concatenate([x[:, -dx:], zc], axis=1))
    return x


def _dw3x3_rows(z: jnp.ndarray, texp: jnp.ndarray) -> jnp.ndarray:
    """3x3 depthwise on channel-STACKED planes [R, w] with per-row taps.

    texp: [R, 9] f32, row r holds the 3x3 taps of the plane that row belongs
    to (zero on gap rows).  out[r, c] = sum_ij texp[r, iy*3+ix] *
    z[r+iy-1, c+ix-1] — i.e. each tap is ONE whole-array shift-multiply-add
    covering every channel at once, instead of one per (channel, tap).  The
    x-shift is hoisted outside the iy sum AND the three sublane y-shifts of
    `z` are hoisted outside the ix loop (they do not depend on ix; Mosaic
    does not CSE the repeated concats): 3 sublane shifts + 2 lane shifts
    per call, down from 9 + 2 (lane realignments are the expensive ones on
    this stack, but the 1-row sublane shifts measured ~3.4 ms of the 7 ms
    bu_dec_l4 kernel in the r2 ablation)."""
    sh = {iy: _shift2(z, -iy, 0) for iy in (-1, 0, 1)}
    acc = None
    for ix in (-1, 0, 1):
        inner = None
        for iy in (-1, 0, 1):
            t = texp[:, (iy + 1) * 3 + (ix + 1):(iy + 1) * 3 + (ix + 1) + 1]
            term = sh[iy] * t.astype(z.dtype)
            inner = term if inner is None else inner + term
        if ix:
            inner = _shift2(inner, 0, -ix)
        acc = inner if acc is None else acc + inner
    return acc


def _merge_dw_stacked(vfs, tes):
    """sum_s dw3x3_rows(vfs[s], tes[s]) via ONE stacked dw pass (see
    STACK_MERGE above).  All inputs share shape [R, w] with gap rows."""
    r = vfs[0].shape[0]
    ts = _dw3x3_rows(jnp.concatenate(vfs, axis=0),
                     jnp.concatenate(tes, axis=0)).astype(jnp.float32)
    acc = None
    for si in range(len(vfs)):
        sl = ts[si * r:(si + 1) * r]
        acc = sl if acc is None else acc + sl
    return acc


def _dw3x3_rows_sum(zs, tes):
    """sum_s dw3x3_rows(zs[s], tes[s]) with the shifts hoisted ACROSS the
    inputs: regrouping  sum_s sum_t tap[s,t] * shift_t(z_s)  as
    sum_t shift_t( sum_s tap[s,t] * z_s )  cuts the shift count from 11 per
    input (9 sublane + 2 lane) to 11 TOTAL — and the 1-row sublane shifts
    are the expensive ops on this stack (ablation: the per-scale merge dws
    were ~2 ms of the 7 ms bench-shape kernel).  Exact regroup: shifts are
    linear."""
    acc = None
    for ix in (-1, 0, 1):
        inner = None
        for iy in (-1, 0, 1):
            k = (iy + 1) * 3 + (ix + 1)
            u = None
            for z, te in zip(zs, tes):
                term = z * te[:, k:k + 1].astype(z.dtype)
                u = term if u is None else u + term
            s = _shift2(u, -iy, 0)
            inner = s if inner is None else inner + s
        if ix:
            inner = _shift2(inner, 0, -ix)
        acc = inner if acc is None else acc + inner
    return acc


_GAP = 8  # zero sublane rows between stacked planes (conv isolation + align)


def _shift_mat(n: int, e: int) -> np.ndarray:
    """[n, n] row-shift operator: (S y)[r] = y[r + e], zero-filled."""
    S = np.zeros((n, n), np.float64)
    idx = np.arange(n)
    ok = (idx + e >= 0) & (idx + e < n)
    S[idx[ok], idx[ok] + e] = 1.0
    return S


def _composed_up_mats(h: int, w: int, hs: int, ws: int):
    """Compose an UP-scale branch (bilinear up -> 3x3 shift -> bilinear back)
    into per-offset source-resolution operators:

        branch(x) = sum_{ey,ex} tap[ey,ex] * P[ey] @ x @ Q[ex]

    with P[e] = U_back_h @ S_e @ U_to_h  ([h, h]) and
    Q[e] = U_to_w^T @ S_e^T @ U_back_w^T ([w, w]).  Exact by matrix algebra
    (verified to ~1e-15 in f64 against the sequential path, including
    boundary zero-fill); eliminates both the up-resolution VPU conv (the
    dominant el-op block: the 2.0-scale branch is 4x the source pixels) and
    ~half the resize MACs, and shrinks the branch working set to [h, w].
    Returned stacked as [3, h, h] / [3, w, w] float32."""
    dh = np.asarray(_interp_matrix(h, hs, True), np.float64)    # [hs, h]
    dwm = np.asarray(_interp_matrix(w, ws, True), np.float64)   # [ws, w]
    uh = np.asarray(_interp_matrix(hs, h, True), np.float64)    # [h, hs]
    uw = np.asarray(_interp_matrix(ws, w, True), np.float64)    # [w, ws]
    P = np.stack([uh @ _shift_mat(hs, e) @ dh for e in (-1, 0, 1)])
    Q = np.stack([dwm.T @ _shift_mat(ws, e).T @ uw.T for e in (-1, 0, 1)])
    return P.astype(np.float32), Q.astype(np.float32)


def _composed_up_branch(xs, te, pm_ref, qm_ref, gsz, gh, h):
    """Composed up-scale branch on channel-STACKED planes xs [gsz*gh, w].

    te: [gsz*gh, 9] f32 per-row taps (zero on gap rows); pm_ref/qm_ref the
    [3, h, h] / [3, w, w] composed operators.  Right dots run stacked (all
    channels in one MXU op); the per-(ey,ex) tap combine is 15 whole-array
    VPU ops; left dots are per channel with f32 accumulation across ey.
    Returns the re-stacked [gsz*gh, w] branch output."""
    cdt = xs.dtype
    R = [jax.lax.dot(xs, qm_ref[ex].astype(cdt),
                     preferred_element_type=jnp.float32).astype(cdt)
         for ex in range(3)]
    T = []
    for ey in range(3):
        comb = None
        for ex in range(3):
            k = ey * 3 + ex
            term = R[ex] * te[:, k:k + 1].astype(cdt)
            comb = term if comb is None else comb + term
        T.append(comb)
    ups = []
    for j in range(gsz):
        accf = None
        for ey in range(3):
            d = jax.lax.dot(pm_ref[ey].astype(cdt),
                            T[ey][j * gh:j * gh + h, :],
                            preferred_element_type=jnp.float32)
            accf = d if accf is None else accf + d
        ups.append(accf.astype(cdt))
    return _stack_planes(ups, xs.shape[1])


def _stack_planes(planes, w):
    """Concat [h_i, w] planes with _GAP zero rows after each -> [R, w]."""
    z = jnp.zeros((_GAP, w), planes[0].dtype)
    parts = []
    for p_ in planes:
        parts += [p_, z]
    return jnp.concatenate(parts, axis=0)


def _expand_rows(vals: jnp.ndarray, h: int, slot: int = None) -> jnp.ndarray:
    """[C, K] per-channel rows -> [C*slot, K] stacked-row layout (traced;
    pre-expands taps/affines outside the kernel; the slot's pad rows zero).
    slot defaults to h + _GAP."""
    c, k = vals.shape
    slot = h + _GAP if slot is None else slot
    body = jnp.broadcast_to(vals[:, None, :], (c, h, k))
    body = jnp.pad(body, ((0, 0), (0, slot - h), (0, 0)))
    return body.reshape(c * slot, k)


def _slot(hs: int) -> int:
    """Stacked-plane slot height: hs rounded up to a multiple of 8 with at
    least one zero pad row (the 3x3 conv halo between stacked planes)."""
    pad = 8 - hs % 8 if hs % 8 else _GAP
    return hs + pad


def _fused_kernel_v2(scales, sizes, slots, h, w, p, o, gsz,
                     x_ref, clsw_ref, tail_ref, aff2e_ref,
                     *rest):
    """Channel-group-stacked fused EfficientPyrPool eval kernel, grid
    (B, P/gsz).

    The (B, P) predecessor (_fused_kernel) issued every depthwise tap as a
    separate tiny shift-multiply on one [h, w] plane; measured cost was
    dominated by per-instruction shift overhead (branch dw 7.6 ms + merge dw
    5.2 ms of 15.7 ms at the bench shape).  Here `gsz` channel planes are
    stacked into one [gsz*slot, w] array, so each tap is ONE whole-array op
    covering the group.  `slot` is the branch height rounded up to a
    multiple of 8 with >=1 zero row; the zero pad (built into the padded
    down/up interpolation matrices, zero taps on pad rows) both isolates
    the 3x3 halo between planes and keeps every slice sublane-aligned, so
    odd branch heights (the 0.1 scale's 13 rows) batch like any other —
    no per-channel fallback.  A full-P stack (grid (B,)) amortizes better
    but its live set blew the 16 MB scoped-VMEM limit at 26.6 MB; gsz~3-4
    fits.  Resize dots stay per-channel (measured fine: ~2.2 ms) and keep
    the v1 op order, so per-plane dot numerics are unchanged.

    rest layout: per scale si (s != 1.0): down_h [slot_si, H] (pad rows
    zero), down_wT, up_h [H, slot_si] (pad cols zero), up_wT — all in the
    compute dtype; then per scale si (all): taps_exp [gsz*slot_si, 9],
    aff1_exp [gsz*gh, 3], mw_exp [gsz*gh, 9] group blocks; then out_ref
    and the classifier accumulator scratch acc_ref (f32 [O, h, w],
    persists across the group steps of one image).
    """
    out_ref = rest[-2]
    acc_ref = rest[-1]
    mats = {}
    mi = 0
    for si, s in enumerate(scales):
        if s > 1.0:  # composed operators: P [3,h,h], Q [3,w,w]
            mats[si] = (rest[mi], rest[mi + 1])
            mi += 2
        elif s != 1.0:
            mats[si] = tuple(rest[mi + j] for j in range(4))
            mi += 4
    per_scale = rest[mi:-2]
    taps_exp = per_scale[0::3]
    aff1_exp = per_scale[1::3]
    mw_exp = per_scale[2::3]

    g = pl.program_id(1)
    n_groups = pl.num_programs(1)
    cdt = x_ref.dtype
    clsw = clsw_ref[:][0].astype(jnp.float32)   # [O, gsz]
    aff2e = aff2e_ref[:].astype(jnp.float32)    # [gsz*gh, 3]

    def dot(a, b):
        return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

    planes = [x_ref[0, c, :, :] for c in range(gsz)]
    gh = h + _GAP
    xs_full = _stack_planes(planes, w)

    merged = None
    vfs_live, tes_live = [], []
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s == 1.0:
            vs = _dw3x3_rows(xs_full, taps_exp[si][:])
        elif s > 1.0:
            vs = _composed_up_branch(xs_full, taps_exp[si][:],
                                     mats[si][0], mats[si][1], gsz, gh, h)
        else:
            down_h, down_wT, up_h, up_wT = mats[si]
            dh = down_h[:]                          # [slot, H], pad rows 0
            uh = up_h[:]                            # [H, slot], pad cols 0
            slot = slots[si]
            ys = jnp.concatenate([dot(dh, pl_) for pl_ in planes], axis=0)
            ys = dot(ys, down_wT[:])                # [gsz*slot, ws]
            ys = _dw3x3_rows(ys, taps_exp[si][:])
            ups = [dot(uh, ys[j * slot:(j + 1) * slot, :])
                   for j in range(gsz)]
            vs = _stack_planes(ups, ws)
            vs = dot(vs, up_wT[:])                  # [gsz*gh, w]
        # f32 affine/PReLU and merge-dw accumulation, exactly as measured
        # fastest: a shift-hoisted all-scale merge (_dw3x3_rows_sum) lost
        # 7.9 vs 7.0 ms, and compute-dtype (bf16) affines/classifier lost
        # 7.5 vs 7.1 ms — the extra converts outweigh the narrower math
        a1 = aff1_exp[si][:].astype(jnp.float32)   # [gsz*gh, 3]
        vf = vs.astype(jnp.float32)
        vf = vf * a1[:, 0:1] + a1[:, 1:2]
        vf = jnp.maximum(vf, 0.0) + a1[:, 2:3] * jnp.minimum(vf, 0.0)
        if STACK_MERGE:
            vfs_live.append(vf.astype(cdt))
            tes_live.append(mw_exp[si][:])
            continue
        t = _dw3x3_rows(vf.astype(cdt), mw_exp[si][:]).astype(jnp.float32)
        # accumulate in place: holding all 5 branch outputs live (the old
        # vfs list) cost ~4 extra f32 [gsz*gh, w] arrays of VMEM and was
        # what kept the full-P (gsz == P) stack over the 16 MB scoped limit
        merged = t if merged is None else merged + t

    if STACK_MERGE:
        merged = _merge_dw_stacked(vfs_live, tes_live)

    merged = merged * aff2e[:, 0:1] + aff2e[:, 1:2]
    merged = (jnp.maximum(merged, 0.0)
              + aff2e[:, 2:3] * jnp.minimum(merged, 0.0))

    # classifier: per-(oc, c) whole-plane multiply-adds.  A rank-3
    # dot_general formulation ([O, gsz] x [gsz, gh, w]) does not lower in
    # Mosaic, and the 2-D alternative needs a [gsz, gh*w] relayout that
    # costs more than the loop.
    mslices = [merged[c * gh:c * gh + h, :] for c in range(gsz)]

    def _cls(oc):
        acc = None
        for c in range(gsz):
            term = mslices[c] * clsw[oc, c]
            acc = term if acc is None else acc + term
        return acc

    if p // gsz == 1:
        # full-P group: classify and finish in one pass — no cross-step
        # accumulator scratch, no init/accum predication
        tail = tail_ref[:].astype(jnp.float32)     # [4, O]
        for oc in range(o):
            y = _cls(oc) + tail[0, oc]
            y = _prelu(y * tail[1, oc] + tail[2, oc], tail[3, oc])
            out_ref[0, oc] = y.astype(out_ref.dtype)
        return

    @pl.when(g == 0)
    def _init():
        for oc in range(o):
            acc_ref[oc] = _cls(oc)

    @pl.when(g > 0)
    def _accum():
        for oc in range(o):
            acc_ref[oc] += _cls(oc)

    @pl.when(g == n_groups - 1)
    def _flush():
        tail = tail_ref[:].astype(jnp.float32)     # [4, O]
        for oc in range(o):
            y = acc_ref[oc] + tail[0, oc]
            y = _prelu(y * tail[1, oc] + tail[2, oc], tail[3, oc])
            out_ref[0, oc] = y.astype(out_ref.dtype)


def pyr_pool_fused_eval_v2(
    x: jnp.ndarray,
    dw_weights: jnp.ndarray,
    aff1: jnp.ndarray,
    merge_weights: jnp.ndarray,
    aff2: jnp.ndarray,
    cls_w: jnp.ndarray,
    cls_b: jnp.ndarray,
    aff3: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
    channel_major_out: bool = False,
    gsz: int | None = None,
) -> jnp.ndarray:
    """Channel-group-stacked variant of pyr_pool_fused_eval (same contract).

    Requires H % 8 == 0 (stacked-plane sublane alignment) and a channel
    group size dividing P; odd branch heights are handled by zero-padded
    slot matrices (see _fused_kernel_v2), so any scale set works."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, p = x.shape
    # largest group size <=4 dividing P: bounds the stacked working set.
    # A full-P stack exceeds the 16 MB scoped-VMEM limit even after the
    # in-place merge accumulation (20.9 MB at p=8, bench shape, down from
    # 21.9); the single-group fast path below still serves p <= 4 heads.
    # `gsz` overrides for A/B.
    if gsz is None:
        gsz = p if p <= 4 else next((d for d in (4, 3, 2) if p % d == 0), 1)
    if h % 8 != 0 or gsz == 1:
        return pyr_pool_fused_eval(
            x, dw_weights, aff1, merge_weights, aff2, cls_w, cls_b, aff3,
            scales, interpret=interpret, channel_major_out=channel_major_out)
    s_n = len(scales)
    o = cls_w.shape[1]
    sizes = _branch_sizes(h, w, scales)
    # up-scales run COMPOSED at source resolution (slot = gh); only
    # down-scales still stack at the branch height
    slots = tuple(
        h + _GAP if s >= 1.0 else _slot(sizes[si][0])
        for si, s in enumerate(scales)
    )

    # interpolation operators in the compute dtype: the kernel's dots cast
    # them to x.dtype anyway, so pre-casting is numerically identical and
    # halves their VMEM footprint on the bf16 path.  down_h gets zero pad
    # ROWS and up_h zero pad COLS out to the slot height, which makes the
    # stacked branch planes 8-aligned with a built-in conv-halo gap.
    mdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    mats = []
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s == 1.0:
            continue
        if s > 1.0:
            P, Q = _composed_up_mats(h, w, hs, ws)
            mats += [jnp.asarray(P, mdt), jnp.asarray(Q, mdt)]
            continue
        dh = _adaptive_avg_matrix(h, hs)
        dw_ = _adaptive_avg_matrix(w, ws)
        uh = _interp_matrix(hs, h, True)
        uw = _interp_matrix(ws, w, True)
        pad = slots[si] - hs
        dh = np.pad(dh, ((0, pad), (0, 0)))     # [slot, H]
        uh = np.pad(uh, ((0, 0), (0, pad)))     # [H, slot]
        mats += [jnp.asarray(dh, mdt), jnp.asarray(dw_.T, mdt),
                 jnp.asarray(uh, mdt), jnp.asarray(uw.T, mdt)]
    taps = dw_weights.astype(jnp.float32).reshape(s_n, 9, p)  # [S, 9, P]
    taps_exp = []
    for si, s in enumerate(scales):
        hs = h if s >= 1.0 else sizes[si][0]
        taps_exp.append(
            _expand_rows(taps[si].T, hs, slots[si]))  # [P*slot, 9]
    aff1_r = aff1.astype(jnp.float32).reshape(3, s_n, p)
    aff1_exp = [_expand_rows(aff1_r[:, si, :].T, h) for si in range(s_n)]
    mw_r = merge_weights.astype(jnp.float32).reshape(9, s_n, p)
    mw_exp = [_expand_rows(mw_r[:, si, :].T, h) for si in range(s_n)]
    aff2_exp = _expand_rows(aff2.astype(jnp.float32).T, h)
    # group-blocked param packs (rank-3 so group blocks cover the minor dims)
    # [P/gsz, O, gsz]: transposed per group for the kernel's dot_general
    clsw_g = cls_w.astype(jnp.float32).reshape(p // gsz, gsz, o)
    clsw_g = jnp.transpose(clsw_g, (0, 2, 1))
    tail = jnp.concatenate([cls_b[None, :], aff3], axis=0)

    kernel_mats = mats  # kernel consumes 4 per scale (s != 1.0), scale order
    per_scale_in = []
    per_scale_specs = []
    gh = h + _GAP
    for si in range(s_n):
        per_scale_in += [taps_exp[si], aff1_exp[si], mw_exp[si]]
        per_scale_specs += [
            pl.BlockSpec((gsz * slots[si], 9), lambda i, g: (g, 0)),
            pl.BlockSpec((gsz * gh, 3), lambda i, g: (g, 0)),
            pl.BlockSpec((gsz * gh, 9), lambda i, g: (g, 0)),
        ]

    from jax.experimental.pallas import tpu as pltpu

    xp = jnp.transpose(x, (0, 3, 1, 2))  # [B, P, H, W]
    full = lambda shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    out = pl.pallas_call(
        partial(_fused_kernel_v2, tuple(scales), sizes, slots, h, w, p, o,
                gsz),
        grid=(b, p // gsz),
        in_specs=[
            pl.BlockSpec((1, gsz, h, w), lambda i, g: (i, g, 0, 0)),
            pl.BlockSpec((1, o, gsz), lambda i, g: (g, 0, 0)),
            full(tail.shape),
            pl.BlockSpec((gsz * gh, 3), lambda i, g: (g, 0)),
            *[full(m.shape) for m in kernel_mats],
            *per_scale_specs,
        ],
        out_specs=pl.BlockSpec((1, o, h, w), lambda i, g: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, o, h, w), x.dtype),
        # the cross-group classifier accumulator is only needed with >1
        # channel group; a token-sized scratch keeps the signature stable
        scratch_shapes=[pltpu.VMEM(
            (o, h, w) if p // gsz > 1 else (1, 8, 128), jnp.float32)],
        interpret=interpret,
    )(xp, clsw_g, tail, aff2_exp,
      *kernel_mats, *per_scale_in)
    if channel_major_out:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


def _tail_up_kernel_v3(scales, h, w, p, x_ref, *refs):
    """Phase A of the split tail (pyr_pool_fused_eval_v3): the s >= 1.0
    branches at FULL P (one grid step per image), emitting the partial
    merge sum  sum_{s>=1} mergeDw(PReLU(aff1(branch_s)))  as [1, P, h, w].

    Splitting the tail in two halves the per-op amortization problem: the
    v2 kernel's gsz<=4 cap came from the UNION of the up-branch working
    set (R/T composed-operator temporaries) and the down+classifier set
    living in VMEM at once; each phase alone fits at full P, so every
    whole-array op covers P channels instead of gsz.  The 1.0-scale
    branch lives here because it shares xs_full with the up branches."""
    out_ref = refs[-1]
    cdt = x_ref.dtype
    gh = h + _GAP
    planes = [x_ref[0, c, :, :] for c in range(p)]
    xs_full = _stack_planes(planes, w)
    acc = None
    ri = 0
    for si, s in enumerate(scales):
        if s < 1.0:
            continue
        if s > 1.0:
            pm, qm, te, a1r, mwr = refs[ri:ri + 5]
            ri += 5
            vs = _composed_up_branch(xs_full, te[:], pm, qm, p, gh, h)
        else:
            te, a1r, mwr = refs[ri:ri + 3]
            ri += 3
            vs = _dw3x3_rows(xs_full, te[:])
        a1 = a1r[:].astype(jnp.float32)
        vf = vs.astype(jnp.float32)
        vf = vf * a1[:, 0:1] + a1[:, 1:2]
        vf = jnp.maximum(vf, 0.0) + a1[:, 2:3] * jnp.minimum(vf, 0.0)
        # NOTE: STACK_MERGE deliberately does NOT apply here — phase A at
        # full P holding its 3 vf stacks live measured 22.8 MB scoped VMEM
        # (> 16 MB hard limit; compile error).  Sequential accumulation
        # keeps one vf live at a time.
        t = _dw3x3_rows(vf.astype(cdt), mwr[:]).astype(jnp.float32)
        acc = t if acc is None else acc + t
    for c in range(p):
        out_ref[0, c] = acc[c * gh:c * gh + h, :].astype(out_ref.dtype)


def _tail_rest_kernel_v3(scales, sizes, slots, h, w, p, o,
                         x_ref, part_ref, clsw_ref, tail_ref, aff2e_ref,
                         *rest):
    """Phase B of the split tail: down-scale branches + phase A's
    partial, post-merge affine/PReLU, classifier and tail — full P, one
    grid step per image.  `rest`: per down-scale 4 resize mats, then per
    down scale (taps_exp, aff1_exp, mw_exp), then out_ref."""
    out_ref = rest[-1]
    cdt = x_ref.dtype
    gh = h + _GAP
    mats = {}
    mi = 0
    for si, s in enumerate(scales):
        if s < 1.0:
            mats[si] = tuple(rest[mi + j] for j in range(4))
            mi += 4
    per_scale = rest[mi:-1]
    clsw = clsw_ref[:].astype(jnp.float32)          # [O, P]
    aff2e = aff2e_ref[:].astype(jnp.float32)        # [P*gh, 3]

    def dot(a, b):
        return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

    planes = [x_ref[0, c, :, :] for c in range(p)]
    # the phase-A partial joins the merge sum (cast cost is one pass; in
    # production the partial is bf16 — one extra rounding of the s>=1
    # half-sum, within the bf16 logit noise floor; the f32 CPU/parity path
    # carries f32 end-to-end)
    merged = _stack_planes([part_ref[0, c, :, :] for c in range(p)],
                           w).astype(jnp.float32)
    vfs_live, tes_live = [], []
    pi = 0
    for si, s in enumerate(scales):
        if s >= 1.0:
            continue
        te, a1r, mwr = per_scale[pi:pi + 3]
        pi += 3
        down_h, down_wT, up_h, up_wT = mats[si]
        slot = slots[si]
        ws = sizes[si][1]
        ys = jnp.concatenate([dot(down_h[:], pl_) for pl_ in planes],
                             axis=0)
        ys = dot(ys, down_wT[:])                # [P*slot, ws]
        ys = _dw3x3_rows(ys, te[:])
        ups = [dot(up_h[:], ys[j * slot:(j + 1) * slot, :])
               for j in range(p)]
        vs = _stack_planes(ups, ws)
        vs = dot(vs, up_wT[:])                  # [P*gh, w]
        a1 = a1r[:].astype(jnp.float32)
        vf = vs.astype(jnp.float32)
        vf = vf * a1[:, 0:1] + a1[:, 1:2]
        vf = jnp.maximum(vf, 0.0) + a1[:, 2:3] * jnp.minimum(vf, 0.0)
        if STACK_MERGE:
            vfs_live.append(vf.astype(cdt))
            tes_live.append(mwr[:])
            continue
        merged = merged + _dw3x3_rows(vf.astype(cdt),
                                      mwr[:]).astype(jnp.float32)

    if STACK_MERGE and vfs_live:
        merged = merged + _merge_dw_stacked(vfs_live, tes_live)
    merged = merged * aff2e[:, 0:1] + aff2e[:, 1:2]
    merged = (jnp.maximum(merged, 0.0)
              + aff2e[:, 2:3] * jnp.minimum(merged, 0.0))
    mslices = [merged[c * gh:c * gh + h, :] for c in range(p)]
    tail = tail_ref[:].astype(jnp.float32)          # [4, O]
    for oc in range(o):
        acc = None
        for c in range(p):
            term = mslices[c] * clsw[oc, c]
            acc = term if acc is None else acc + term
        y = acc + tail[0, oc]
        y = _prelu(y * tail[1, oc] + tail[2, oc], tail[3, oc])
        out_ref[0, oc] = y.astype(out_ref.dtype)


def pyr_pool_fused_eval_v3(
    x: jnp.ndarray,
    dw_weights: jnp.ndarray,
    aff1: jnp.ndarray,
    merge_weights: jnp.ndarray,
    aff2: jnp.ndarray,
    cls_w: jnp.ndarray,
    cls_b: jnp.ndarray,
    aff3: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
    channel_major_out: bool = False,
) -> jnp.ndarray:
    """Split-tail variant of pyr_pool_fused_eval_v2 (same contract): two
    full-P kernels — up-scale branches emit a partial merge sum, the rest
    kernel finishes (1.0/down branches, merge affine/PReLU, classifier).
    Falls back to v2 when the full-P stack would not fit VMEM.

    Rejected (r2): moving the classifier OUT of phase B.  The in-kernel
    per-(oc, c) plane loop is the expensive part of the O=19/P=9 head
    (6.0 ms in-trace vs 1.9 at O=11 — op-issue bound, ~342 small [h,w]
    VPU ops/image), but every split attempt lost the VMEM residence of
    `merged` and measured worse end-to-end: phase B emitting [B,P,h,w]
    + XLA "po,bphw->bohw" einsum classifier 1391 img/s (the dot
    normalizes batch dims and pays a full [B,O,H,W] transpose); + a
    dedicated plane-loop classifier kernel 1418.6; + a broadcast-slab
    [O*h, w] classifier kernel 1397.9; integrated baseline 1441.5."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, p = x.shape
    gh = h + _GAP
    # full-P guard: measured scoped-VMEM at the bench shape (h=128, w=240,
    # bf16): p=8 fits both phases; p=9 puts phase A at 18.2 MB — fall back
    if h % 8 != 0 or p * gh * -(-w // 128) > 2200 \
            or not any(s >= 1.0 for s in scales):
        return pyr_pool_fused_eval_v2(
            x, dw_weights, aff1, merge_weights, aff2, cls_w, cls_b, aff3,
            scales, interpret=interpret, channel_major_out=channel_major_out)
    s_n = len(scales)
    o = cls_w.shape[1]
    sizes = _branch_sizes(h, w, scales)
    slots = tuple(
        h + _GAP if s >= 1.0 else _slot(sizes[si][0])
        for si, s in enumerate(scales)
    )
    mdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32

    up_mats, down_mats = {}, {}
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s > 1.0:
            P, Q = _composed_up_mats(h, w, hs, ws)
            up_mats[si] = (jnp.asarray(P, mdt), jnp.asarray(Q, mdt))
        elif s < 1.0:
            dh = _adaptive_avg_matrix(h, hs)
            dw_ = _adaptive_avg_matrix(w, ws)
            uh = _interp_matrix(hs, h, True)
            uw = _interp_matrix(ws, w, True)
            pad = slots[si] - hs
            dh = np.pad(dh, ((0, pad), (0, 0)))
            uh = np.pad(uh, ((0, 0), (0, pad)))
            down_mats[si] = (jnp.asarray(dh, mdt), jnp.asarray(dw_.T, mdt),
                             jnp.asarray(uh, mdt), jnp.asarray(uw.T, mdt))

    taps = dw_weights.astype(jnp.float32).reshape(s_n, 9, p)
    taps_exp = [
        _expand_rows(taps[si].T, h if s >= 1.0 else sizes[si][0], slots[si])
        for si, s in enumerate(scales)
    ]
    aff1_r = aff1.astype(jnp.float32).reshape(3, s_n, p)
    aff1_exp = [_expand_rows(aff1_r[:, si, :].T, h) for si in range(s_n)]
    mw_r = merge_weights.astype(jnp.float32).reshape(9, s_n, p)
    mw_exp = [_expand_rows(mw_r[:, si, :].T, h) for si in range(s_n)]
    aff2_exp = _expand_rows(aff2.astype(jnp.float32).T, h)
    clsw_t = cls_w.astype(jnp.float32).T            # [O, P]
    tail = jnp.concatenate([cls_b[None, :], aff3], axis=0)

    xp = jnp.transpose(x, (0, 3, 1, 2))             # [B, P, H, W]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    img = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1))

    up_in, up_specs = [], []
    for si, s in enumerate(scales):
        if s < 1.0:
            continue
        if s > 1.0:
            up_in += [up_mats[si][0], up_mats[si][1]]
            up_specs += [full(up_mats[si][0].shape),
                         full(up_mats[si][1].shape)]
        up_in += [taps_exp[si], aff1_exp[si], mw_exp[si]]
        up_specs += [full(taps_exp[si].shape), full(aff1_exp[si].shape),
                     full(mw_exp[si].shape)]
    part = pl.pallas_call(
        partial(_tail_up_kernel_v3, tuple(scales), h, w, p),
        grid=(b,),
        in_specs=[img((1, p, h, w)), *up_specs],
        out_specs=img((1, p, h, w)),
        out_shape=jax.ShapeDtypeStruct((b, p, h, w), x.dtype),
        interpret=interpret,
    )(xp, *up_in)

    rest_in, rest_specs = [], []
    for si, s in enumerate(scales):
        if s < 1.0:
            rest_in += list(down_mats[si])
            rest_specs += [full(m.shape) for m in down_mats[si]]
    for si, s in enumerate(scales):
        if s >= 1.0:
            continue
        rest_in += [taps_exp[si], aff1_exp[si], mw_exp[si]]
        rest_specs += [full(taps_exp[si].shape), full(aff1_exp[si].shape),
                       full(mw_exp[si].shape)]
    out = pl.pallas_call(
        partial(_tail_rest_kernel_v3, tuple(scales), sizes, slots, h, w,
                p, o),
        grid=(b,),
        in_specs=[img((1, p, h, w)), img((1, p, h, w)),
                  full(clsw_t.shape), full(tail.shape),
                  full(aff2_exp.shape), *rest_specs],
        out_specs=img((1, o, h, w)),
        out_shape=jax.ShapeDtypeStruct((b, o, h, w), x.dtype),
        interpret=interpret,
    )(xp, part, clsw_t, tail, aff2_exp, *rest_in)
    if channel_major_out:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))


def _pyr_branches_impl(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused pyramid-pool branch stack (raw pallas_call, no VJP).

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


def _branches_kernel_v2(scales, sizes, slots, h, w, p, gsz,
                        x_ref, *rest):
    """Channel-group-stacked branch stack (grid (B, P/gsz)) — the same
    one-tap-one-op restructure as _fused_kernel_v2 but WITHOUT the tail
    (the wide inner decoder stages keep their XLA tail, which measured
    faster than in-kernel for O >= 32).

    rest: per scale (s != 1.0): down_h [slot, H] / down_wT / up_h [H, slot]
    / up_wT (compute dtype, slot-padded); then per scale: taps_exp
    [gsz*R_s, 9]; then out_ref [1, S, gsz, h, w] (channel-group block of
    the [B, S, P, H, W] output)."""
    out_ref = rest[-1]
    mats = {}
    mi = 0
    for si, s in enumerate(scales):
        if s > 1.0:  # composed operators: P [3,h,h], Q [3,w,w]
            mats[si] = (rest[mi], rest[mi + 1])
            mi += 2
        elif s != 1.0:
            mats[si] = tuple(rest[mi + j] for j in range(4))
            mi += 4
    taps_exp = rest[mi:-1]
    cdt = x_ref.dtype

    def dot(a, b):
        return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

    planes = [x_ref[0, c, :, :] for c in range(gsz)]
    gh = h + _GAP
    xs_full = _stack_planes(planes, w)
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s == 1.0:
            vs = _dw3x3_rows(xs_full, taps_exp[si][:])
        elif s > 1.0:
            vs = _composed_up_branch(xs_full, taps_exp[si][:],
                                     mats[si][0], mats[si][1], gsz, gh, h)
        else:
            down_h, down_wT, up_h, up_wT = mats[si]
            dh = down_h[:]
            uh = up_h[:]
            slot = slots[si]
            ys = jnp.concatenate([dot(dh, pl_) for pl_ in planes], axis=0)
            ys = dot(ys, down_wT[:])
            ys = _dw3x3_rows(ys, taps_exp[si][:])
            ups = [dot(uh, ys[j * slot:(j + 1) * slot, :])
                   for j in range(gsz)]
            vs = _stack_planes(ups, ws)
            vs = dot(vs, up_wT[:])
        for j in range(gsz):
            out_ref[0, si, j] = vs[j * gh:j * gh + h, :]


def _pyr_branches_impl_v2(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
    gsz: int | None = None,
) -> jnp.ndarray:
    """Group-stacked variant of _pyr_branches_impl (same contract)."""
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, p = x.shape
    s_n = len(scales)
    if gsz is None:
        gsz = next((d for d in (4, 3, 2) if p % d == 0), 1)
    if h % 8 != 0 or gsz == 1:
        return _pyr_branches_impl(x, weights, scales, interpret=interpret)
    sizes = _branch_sizes(h, w, scales)
    slots = tuple(
        h + _GAP if s >= 1.0 else _slot(sizes[si][0])
        for si, s in enumerate(scales)
    )
    mdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    mats = []
    for si, s in enumerate(scales):
        hs, ws = sizes[si]
        if s == 1.0:
            continue
        if s > 1.0:
            P, Q = _composed_up_mats(h, w, hs, ws)
            mats += [jnp.asarray(P, mdt), jnp.asarray(Q, mdt)]
            continue
        dh = _adaptive_avg_matrix(h, hs)
        dw_ = _adaptive_avg_matrix(w, ws)
        uh = _interp_matrix(hs, h, True)
        uw = _interp_matrix(ws, w, True)
        pad = slots[si] - hs
        dh = np.pad(dh, ((0, pad), (0, 0)))
        uh = np.pad(uh, ((0, 0), (0, pad)))
        mats += [jnp.asarray(dh, mdt), jnp.asarray(dw_.T, mdt),
                 jnp.asarray(uh, mdt), jnp.asarray(uw.T, mdt)]
    taps = weights.astype(jnp.float32).reshape(s_n, 9, p)
    taps_exp = []
    per_scale_specs = []
    for si, s in enumerate(scales):
        hs = h if s >= 1.0 else sizes[si][0]
        taps_exp.append(_expand_rows(taps[si].T, hs, slots[si]))
        per_scale_specs.append(
            pl.BlockSpec((gsz * slots[si], 9), lambda i, g: (g, 0)))

    xp = jnp.transpose(x, (0, 3, 1, 2))  # [B, P, H, W]
    full = lambda shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    out = pl.pallas_call(
        partial(_branches_kernel_v2, tuple(scales), sizes, slots, h, w, p,
                gsz),
        grid=(b, p // gsz),
        in_specs=[
            pl.BlockSpec((1, gsz, h, w), lambda i, g: (i, g, 0, 0)),
            *[full(m.shape) for m in mats],
            *per_scale_specs,
        ],
        out_specs=pl.BlockSpec((1, s_n, gsz, h, w),
                               lambda i, g: (i, 0, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s_n, p, h, w), x.dtype),
        interpret=interpret,
    )(xp, *mats, *taps_exp)
    out = out.reshape(b, s_n * p, h, w)
    return jnp.transpose(out, (0, 2, 3, 1))  # [B, H, W, S*P]


from functools import lru_cache


@lru_cache(maxsize=None)
def _branches_with_vjp(scales: Tuple[float, ...]):
    """custom-VJP wrapper per static scale tuple: Pallas forward, backward
    via jax.vjp over the jnp reference (the stack is the same math, so the
    gradient is exact up to fp accumulation order) — this keeps the kernel
    usable inside the training step."""

    @jax.custom_vjp
    def f(x, w):
        return _pyr_branches_impl_v2(x, w, scales)

    def fwd(x, w):
        return f(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        _, vjp = jax.vjp(lambda xx, ww: pyr_branches_jnp(xx, ww, scales),
                         x, w)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def pyr_branches_pallas(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    scales: Sequence[float],
    interpret: bool = False,
) -> jnp.ndarray:
    """Public entry: differentiable fused branch stack (see _pyr_branches_impl
    for semantics; backward runs the jnp reference's VJP)."""
    if interpret:
        return _pyr_branches_impl(x, weights, scales, interpret=True)
    return _branches_with_vjp(tuple(scales))(x, weights)

