"""Pallas TPU kernel: whole EESP *stage* fused, eval mode.

The encoder's EESP stages (SURVEY.md §2 "EESP unit"; 3 units at 1/8, 7 at
1/16 for s=2.0) dominate encoder HBM traffic under XLA: every unit is ~7
tensor-sized round trips (proj write/read, K branch outputs, concat, BR,
expand, residual) on 63-126 MB activations.  This kernel runs a CHAIN of
EESP units over one image entirely in VMEM: read the stage input once,
write the stage output once.

Layout: pixels-as-rows, channels-as-lanes.  The input [B, H, W, C] is
zero-padded to Wp = ceil(W/8)*8 columns and viewed as [B, H*Wp, C] (both
free/cheap in XLA: the pad fuses, the reshape is a bitcast).  In this flat
form a depthwise dilated 3x3 becomes 9 sublane SHIFTS:

  h-shift by dy*d  ->  row shift by dy*d*Wp  (ALIGNED: Wp % 8 == 0)
  w-shift by dx*d  ->  row shift by dx*d     (unaligned, 2 per branch with
                                              the x-hoisted tap order)

and the pad columns double as the w-direction zero halo whenever
d <= Wp - W (true for every ESPNetv2 stage at the bench shapes); larger
dilations get static edge masks.  Channels never shift — depthwise taps are
lane-vector multiplies.

1x1-conv FLOP accounting (v2): the proj runs as one [R, C] x [C, n] dot
with a block-diagonal-densified kernel (ops/grouped_conv.py trick — its
true-grouped form would be K dots with N = n/K <= 32, too narrow for the
MXU).  The EXPAND does NOT densify: its group boundaries coincide exactly
with the branch boundaries (groups = K, group width = n = C/K), so each
post-BR branch [R, n] is dotted with its own [n, n] expand block — 4x fewer
MXU FLOPs than the dense [C, C] dot at full lane width (n = 128 at C=512,
64 at C=256), and the concat moves after the dots.  BN scales are folded
into pw/ewg host-side (eesp_block_params), leaving only bias+PReLU VPU work
in-kernel; branches with equal dilation (stage4's schedule is 1,1,2,3)
share their h-shifted arrays.

Eval-only: BatchNorms fold to per-channel affines from running statistics
(training keeps the lax path, exactly like the fused pyramid-pool tail in
ops/pallas_pyrpool.py).  Unit math matches mspl_tpu/layers/eesp.py::EESP
op-for-op: proj CBR -> K dilated depthwise + HFF -> BR -> grouped CB expand
-> residual add -> PReLU.

VMEM: chains are capped at `max_blocks` units per pallas_call (expand
weights are C x C; seven 512-wide units' params plus double buffering would
crowd the 16 MB scoped limit), so the 7-unit stage runs as 4 + 3.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _shift_rows(x: jnp.ndarray, dy: int) -> jnp.ndarray:
    """shift_rows(x, dy)[r] = x[r - dy], zero-filled (2-D [R, C])."""
    if dy == 0:
        return x
    r = x.shape[0]
    if abs(dy) >= r:  # tiny feature maps: the window is entirely padding
        return jnp.zeros_like(x)
    z = jnp.zeros((abs(dy), x.shape[1]), x.dtype)
    if dy > 0:
        return jnp.concatenate([z, x[:r - dy]], axis=0)
    return jnp.concatenate([x[-dy:], z], axis=0)


def _prelu(x, alpha):
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def _kernel(dilations, nb, n, c, wp, rimg, bb, need_mask, grouped, pack,
            x_ref, pw_ref, paff_ref, taps_ref, cataff_ref, ew_ref, eaff_ref,
            alpha_ref, padmask_ref, hmask_ref, *mask_and_out):
    """One grid step = `bb` images through `nb` chained EESP units.

    x block [1, bb*R, C] (R = rimg = H*Wp flat pixel rows per image);
    stacked params (BN scales pre-folded into pw/ew):
    pw [nb, C, n], paff [nb, 2, n] (bias, PReLU alpha),
    taps [nb, K*9, n], cataff [nb, ngrp, 3, gw*n] (per-super-group BR
    affine+alpha; ngrp=1, gw*n=C on the dense path),
    ew [nb, ngrp, gw*n, gw*n] when `grouped` (one block-diagonal expand
    block per super-group of gw branches) else [nb, C, C] dense,
    eaff [nb, 1, C] (bias), alpha [nb, 1, C];
    padmask [bb*R, 1]; hmask [bb*R, 2*n_dils] (per-dilation +/- h-shift
    image-boundary masks, zero where a shift crossed into the neighboring
    image in the stack); then one [bb*R, 2] edge mask per dilation in
    `need_mask`, then out_ref.
    """
    masks = {d: mask_and_out[i] for i, d in enumerate(need_mask)}
    out_ref = mask_and_out[-1]
    cdt = x_ref.dtype
    k = len(dilations)
    dils = sorted(set(dilations))

    def dot(a, b):
        return jax.lax.dot(a, b.astype(cdt),
                           preferred_element_type=jnp.float32).astype(cdt)

    padmask = padmask_ref[:].astype(cdt)            # [bb*R, 1]
    if pack > 1:
        # lane-pack `pack` images into branch-major order [(g0,img0),
        # (g0,img1),(g1,img0),...], n0 lanes each (n0 = original branch
        # width) — matches the packed params built by _prep
        n0 = (c // pack) // k
        x = jnp.concatenate(
            [x_ref[j][:, g * n0:(g + 1) * n0]
             for g in range(k) for j in range(pack)], axis=1)
    else:
        x = x_ref[0]                                # [bb*R, C]
    for bi in range(nb):
        pw = pw_ref[bi]
        paff = paff_ref[bi].astype(cdt)             # [2, n]
        eaff = eaff_ref[bi].astype(cdt)             # [1, C]
        alpha = alpha_ref[bi, 0].astype(cdt)        # [C]

        y = dot(x, pw)                              # proj 1x1 [bb*R, n]
        y = _prelu(y + paff[0][None, :], paff[1][None, :])
        # re-zero the Wp-W pad rows: they must stay an exact conv halo for
        # the shifts below (BN bias would otherwise leak into them)
        y = y * padmask

        # h-shifts shared between adjacent equal-dilation branches (the
        # sorted schedule makes equal-d branches adjacent); a shared
        # all-dilation cache held 9-12 arrays live and pushed the VMEM
        # stack over its limit.  Image-boundary masked (the mask column is
        # all-zero when d*wp >= rimg: window fully padding).
        def hshift(d, dy):
            if dy == 0:
                return y
            s = _shift_rows(y, dy * d * wp)
            if bb == 1:
                # single image per step: _shift_rows' zero fill IS the
                # image boundary; masking would only add temporaries
                return s
            col = dils.index(d) * 2 + (0 if dy > 0 else 1)
            return s * hmask_ref[:, col:col + 1].astype(cdt)

        hsh, prev_d = None, None
        prev = None
        parts = []
        for ki, d in enumerate(dilations):
            if d != prev_d:
                hsh = {dy: hshift(d, dy) for dy in (-1, 0, 1)}
                prev_d = d
            acc = None
            for ix in (-1, 0, 1):
                inner = None
                for iy in (-1, 0, 1):
                    # conv 'same': out(h, w) += t[iy, ix] * y(h+iy, w+ix);
                    # y(h+iy, .) = shift_rows(y, -iy*d*wp) = hsh[-iy]
                    tap = taps_ref[bi, ki * 9 + (iy + 1) * 3 + (ix + 1), :]
                    s = hsh[-iy]
                    term = s * tap[None, :].astype(cdt)
                    inner = term if inner is None else inner + term
                if ix:
                    inner = _shift_rows(inner, -ix * d)
                    if d in masks:
                        # +ix reads w+d (invalid past W-1 -> keep_neg col);
                        # -ix reads w-d (invalid below 0 -> keep_pos col)
                        m = masks[d][:].astype(cdt)
                        inner = inner * (m[:, 1:2] if ix > 0 else m[:, 0:1])
                acc = inner if acc is None else acc + inner
            if prev is not None:
                acc = acc + prev                    # HFF cumulative add
            prev = acc
            parts.append(acc)
        # post-concat BR + expand run on SUPER-GROUPS of `gw` branches
        # (gw = ceil(128 / n)): narrow-n stages (n = 64 at C=256) would
        # otherwise run the BR affine at half VPU width and the expand
        # dots at half MXU lane width.  concat(BN(.)) == BN(concat(.))
        # (per-channel affine), and the paired expand blocks are shipped
        # pre-block-diagonalized ([gw*n, gw*n] per super-group) — 2x
        # densification instead of the dense path's K x.
        gw = (ew_ref.shape[2] // n) if grouped else 1
        zparts = []
        for g0 in range(0, k, gw) if grouped else ():
            sg = (parts[g0] if gw == 1 else
                  jnp.concatenate(parts[g0:g0 + gw], axis=1))
            ca = cataff_ref[bi, g0 // gw].astype(cdt)   # [3, gw*n]
            sg = _prelu(sg * ca[0][None, :] + ca[1][None, :],
                        ca[2][None, :])
            zparts.append(dot(sg, ew_ref[bi, g0 // gw]))
        if grouped:
            z = (zparts[0] if len(zparts) == 1 else
                 jnp.concatenate(zparts, axis=1))   # [R, K*n = C]
        else:
            z = jnp.concatenate(parts, axis=1)
            ca = cataff_ref[bi, 0].astype(cdt)      # [3, C]
            z = _prelu(z * ca[0][None, :] + ca[1][None, :], ca[2][None, :])
            z = dot(z, ew_ref[bi])                  # dense expand fallback
        z = z + eaff[0][None, :]
        z = z + x                                   # residual
        x = _prelu(z, alpha[None, :])
    # zero the Wp-W pad rows on exit: the carried residual re-adds junk into
    # them each unit, and downstream conv halos (the next DownSampler under
    # the padded-layout contract) need exact zeros there.  One multiply per
    # grid step — free next to the unit loop.
    x = x * padmask
    if pack > 1:
        for j in range(pack):
            out_ref[j] = jnp.concatenate(
                [x[:, (g * pack + j) * n0:(g * pack + j + 1) * n0]
                 for g in range(k)], axis=1)
    else:
        out_ref[0] = x


def _edge_masks(h: int, w: int, wp: int, dilations, dtype=np.float32):
    """Static [R, 1] masks for dilations whose w-halo exceeds the pad cols.

    mask[r] = 1 iff pixel (h, w=r%wp) has w >= d (valid source for a
    +d w-shift); the -d direction uses (1 - mask) mirrored — but note the
    mirrored predicate is w < W - d, so we build both explicitly."""
    need = sorted({d for d in dilations if d > wp - w})
    out = {}
    for d in need:
        col = np.arange(wp) % wp
        keep_pos = (col >= d).astype(dtype)          # +d shift: w-d >= 0
        keep_neg = (col < w - d).astype(dtype)       # -d shift: w+d < W
        out[d] = (np.tile(keep_pos, h)[:, None],
                  np.tile(keep_neg, h)[:, None])
    return out


def eesp_stage_fused_eval(
    x: jnp.ndarray,
    blocks: List[Dict[str, jnp.ndarray]],
    dilations: Sequence[int],
    interpret: bool = False,
    max_blocks: int = 4,
    images_per_step: int | None = None,
    lane_pack: int | None = None,
    padded_io: bool = False,
    true_w: int | None = None,
) -> jnp.ndarray:
    """Run a chain of stride-1 EESP units (eval mode) as fused kernels.

    x: [B, H, W, C]; blocks: per unit a dict (BN scales pre-folded) with
      pw   [C, n]     dense (block-diagonalized) proj weight * BN scale
      paff [2, n]     proj BN bias + PReLU alpha
      taps [K*9, n]   branch depthwise taps (branch-major, row-major 3x3)
      cataff [K, 3, n] per-branch post-concat BN affine + PReLU alpha
      ew   [K, n, n]  per-branch expand blocks (grouped) or [C, C] dense
      eaff [1, C]     expand BN bias
      alpha [C]       final PReLU
    Returns [B, H, W, C].

    `padded_io=True` is the layout contract (docs/ENCODER_ROOFLINE.md):
    x arrives ALREADY padded to [B, H, Wp, C] with true image width
    `true_w` (pad columns may be arbitrary junk — the kernel re-zeros them
    after the first proj), and the result is returned padded with EXACT
    zero pad columns (safe as a conv halo downstream).  This skips the
    per-call entry pad and exit slice relayouts.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    b, h, w, c = x.shape
    if padded_io:
        if true_w is None or w % 8:
            raise ValueError("padded_io needs an 8-aligned padded input "
                             "and its true_w")
        wp, w = w, true_w
    k = len(dilations)
    n = c // k
    if not padded_io:
        wp = -(-w // 8) * 8
    r = h * wp

    grouped = blocks[0]["ew"].ndim == 3
    assert all((blk["ew"].ndim == 3) == grouped for blk in blocks), \
        "mixed grouped/dense expand weights in one stage"

    # Lane packing: when the branch width n is below the 128-lane vector
    # width, pack p = 128//n images side-by-side in lanes so every branch
    # shift/tap op runs at full VPU width and the per-branch expand dots
    # at full MXU lane width (p-fold block-diagonal blocks; same FLOPs as
    # the super-grouped pairing, half the vector-op count).  The carried
    # activation uses a BRANCH-MAJOR lane order [(g0,img0),(g0,img1),
    # (g1,img0),...] so the residual add lines up with the expand output;
    # the proj weight absorbs the permutation (see _pack_params).
    pack = 1
    if grouped and n < 128:
        pack = lane_pack or max(1, 128 // n)
        while pack > 1 and b % pack:
            pack //= 2
    # images per grid step (row stacking; only without lane packing):
    # bigger arrays amortize per-op overhead, bounded by 1 MB block bytes
    if pack > 1:
        bb = 1
    else:
        bb = images_per_step or next(
            (d for d in (4, 2)
             if b % d == 0 and d * r * c * x.dtype.itemsize <= 1 << 20),
            1)
    rb = bb * r

    if padded_io:
        xp = x  # already [B, H, Wp, C]
    else:
        xp = (x if wp == w
              else jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0))))
    xf = xp.reshape(b // bb, rb, c) if pack == 1 else xp.reshape(b, r, c)

    tile = lambda pat: jnp.asarray(np.tile(pat, bb)[:, None])
    padmask = tile(np.tile((np.arange(wp) < w).astype(np.float32), h))
    dils = sorted(set(dilations))
    # per-(dilation, sign) h-shift masks: zero rows whose shifted source
    # falls outside the row's own image segment in the bb-stack
    local = np.arange(r)
    hcols = []
    for d in dils:
        s = d * wp
        hcols.append(np.tile((local >= s).astype(np.float32), bb))
        hcols.append(np.tile((local < r - s).astype(np.float32), bb))
    hmask = jnp.asarray(np.stack(hcols, axis=1))      # [bb*R, 2*n_dils]
    emasks = _edge_masks(h, w, wp, dilations)
    need_mask = tuple(sorted(emasks))
    # one mask input per masked dilation: the +/- pair as a [bb*R, 2] array
    mask_in = [jnp.asarray(np.tile(np.concatenate(emasks[d], axis=1),
                                   (bb, 1)))
               for d in need_mask]

    def _prep(blk):
        """Per-unit param prep: lane packing or super-group coalescing."""
        out = dict(blk)
        if pack > 1:
            eye = jnp.eye(pack, dtype=blk["pw"].dtype)
            pwr = blk["pw"].reshape(k, n, n)
            # rows branch-major (g, j, ci), cols image-major (j, co): the
            # proj dot converts the carried branch-major x into the shared
            # image-major y the taps/branch arrays use
            out["pw"] = jnp.einsum("gio,jJ->gjiJo", pwr, eye).reshape(
                pack * c, pack * n)
            out["ew"] = jnp.einsum("gio,jJ->gjiJo", blk["ew"], eye).reshape(
                k, pack * n, pack * n)
            out["paff"] = jnp.tile(blk["paff"], (1, pack))
            out["taps"] = jnp.tile(blk["taps"], (1, pack))
            out["cataff"] = jnp.tile(blk["cataff"], (1, 1, pack))
            out["eaff"] = jnp.tile(
                blk["eaff"].reshape(1, k, 1, n), (1, 1, pack, 1)
            ).reshape(1, pack * c)
            out["alpha"] = jnp.tile(
                blk["alpha"].reshape(k, 1, n), (1, pack, 1)
            ).reshape(pack * c)
        elif grouped and n < 128:
            # coalesce branches into super-groups of gw = ceil(128/n) so
            # the BR affine and expand dots run at full 128-lane width
            # (gw-fold block-diagonal expand blocks: gw x densification,
            # vs K x for the fully dense path)
            gw = min(k, max(1, -(-128 // n)))
            while k % gw:
                gw += 1
            ngrp = k // gw
            eye = jnp.eye(gw, dtype=blk["ew"].dtype)
            out["ew"] = jnp.einsum(
                "sgio,gG->sgiGo", blk["ew"].reshape(ngrp, gw, n, n), eye
            ).reshape(ngrp, gw * n, gw * n)
            out["cataff"] = blk["cataff"].reshape(
                ngrp, gw, 3, n).transpose(0, 2, 1, 3).reshape(ngrp, 3,
                                                              gw * n)
        return out

    blocks = [_prep(blk) for blk in blocks]
    out = xf
    for b0 in range(0, len(blocks), max_blocks):
        grp = blocks[b0:b0 + max_blocks]
        nb = len(grp)
        stack = {key: jnp.stack([blk[key] for blk in grp])
                 for key in ("pw", "paff", "taps", "cataff", "ew", "eaff")}
        alpha = jnp.stack([blk["alpha"][None, :] for blk in grp])
        mdt = out.dtype
        full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
        out = pl.pallas_call(
            partial(_kernel, tuple(dilations), nb, pack * n, pack * c, wp,
                    r, bb, need_mask, grouped, pack),
            grid=(b // (bb * pack),),
            in_specs=[
                pl.BlockSpec((pack, rb, c), lambda i: (i, 0, 0)),
                full(stack["pw"].shape),
                full(stack["paff"].shape),
                full(stack["taps"].shape),
                full(stack["cataff"].shape),
                full(stack["ew"].shape),
                full(stack["eaff"].shape),
                full(alpha.shape),
                full(padmask.shape),
                full(hmask.shape),
                *[full(m.shape) for m in mask_in],
            ],
            out_specs=pl.BlockSpec((pack, rb, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xf.shape, out.dtype),
            interpret=interpret,
        )(out,
          stack["pw"].astype(mdt), stack["paff"], stack["taps"],
          stack["cataff"], stack["ew"].astype(mdt), stack["eaff"], alpha,
          padmask, hmask, *mask_in)
    out = out.reshape(b, h, wp, c)
    if padded_io:
        return out  # padded layout contract: zero pad cols, no slice
    return out[:, :, :w, :] if wp != w else out


def _bn_affine(pvars, svars, eps: float = 1e-5):
    a = pvars["scale"] / jnp.sqrt(svars["var"] + eps)
    return a, pvars["bias"] - svars["mean"] * a


def _dense_1x1(kernel: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[1, 1, Cin/G, Cout] grouped 1x1 HWIO kernel -> dense [Cin, Cout]
    block-diagonal (same densification as ops/grouped_conv.py)."""
    _, _, cin_g, cout = kernel.shape
    kg = kernel[0, 0].reshape(cin_g, groups, cout // groups)
    eye = jnp.eye(groups, dtype=kernel.dtype)
    dense = jnp.einsum("igo,gG->Gigo", kg, eye)
    return dense.reshape(cin_g * groups, cout)


def eesp_block_params(pvars, svars, k: int) -> Dict[str, jnp.ndarray]:
    """Extract one EESP unit's fused-kernel arrays from its bound flax
    variables (params pvars / batch_stats svars) — layers/eesp.py::EESP
    param tree (proj_1x1 CBR, dw_d{i}_kernel, br_after_cat BR,
    conv_1x1_exp CB, module_act PReLU)."""
    proj_k = pvars["proj_1x1"]["CB_0"]["C_0"]["Conv_0"]["kernel"]
    n = proj_k.shape[3]
    taps = jnp.concatenate(
        [pvars[f"dw_d{i}_kernel"].reshape(9, n) for i in range(k)], axis=0)
    c = n * k
    # stage blocks keep C (nin == nout), so the grouped kernel's I dim is
    # C/G -> infer G from it (1 when the unit fell back to dense)
    g_proj = c // proj_k.shape[2]
    pa, pb = _bn_affine(pvars["proj_1x1"]["CB_0"]["BatchNorm_0"],
                        svars["proj_1x1"]["CB_0"]["BatchNorm_0"])
    # BN scales fold into the conv weights host-side (out-channel scaling of
    # a 1x1 conv == post-scale); the kernel applies bias + PReLU only
    paff = jnp.stack([pb, pvars["proj_1x1"]["PReLU_0"]["alpha"]])
    ca, cb = _bn_affine(pvars["br_after_cat"]["BatchNorm_0"],
                        svars["br_after_cat"]["BatchNorm_0"])
    cstack = jnp.stack([ca, cb, pvars["br_after_cat"]["PReLU_0"]["alpha"]])
    exp_k = pvars["conv_1x1_exp"]["C_0"]["Conv_0"]["kernel"]
    g_exp = c // exp_k.shape[2]
    ea, eb = _bn_affine(pvars["conv_1x1_exp"]["BatchNorm_0"],
                        svars["conv_1x1_exp"]["BatchNorm_0"])
    if g_exp == k:
        # grouped expand: input group g of the grouped 1x1 IS branch g
        # (group width C/G == n) — ship one [n, n] block per branch; the
        # stage function coalesces or lane-packs them to MXU/VPU widths
        kg = exp_k[0, 0].reshape(n, k, n)                       # [in, G, out]
        ew = kg.transpose(1, 0, 2) * ea.reshape(k, 1, n)        # [K, n, n]
        cataff = cstack.reshape(3, k, n).transpose(1, 0, 2)     # [K, 3, n]
    else:
        ew = _dense_1x1(exp_k, g_exp) * ea[None, :]
        cataff = cstack[None, :, :]                             # [1, 3, C]
    return {
        "pw": _dense_1x1(proj_k, g_proj) * pa[None, :],
        "paff": paff,
        "taps": taps,
        "cataff": cataff,
        "ew": ew,
        "eaff": eb[None, :],
        "alpha": pvars["module_act"]["alpha"],
    }
