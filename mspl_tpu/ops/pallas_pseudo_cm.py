"""Pallas TPU kernel: fused softmax→label-space-convert→soft-fuse→threshold
over CHANNEL-MAJOR logits (BASELINE.json:5 north-star fused pass, take 2).

The jnp fusion pass costs ~9.5 ms of the 134 ms bench batch (7%) because in
NHWC the class dim (5-19) is the lane dim — 6-25x lane waste on every
softmax/convert op, plus layout copies.  The earlier pixel-major kernel
(ops/pallas_pseudo.py) suffered the same padding.  This kernel instead takes
logits as [B, C, H, W] (the model emits them that way for free — the final
resize einsum absorbs the transpose, see resize_bilinear_to_cm) and works on
[h_block, W] planes with W as the lane dim:

  grid = (B, H/h_block); per model: per-class planes -> running max ->
  exp/sum -> converted target probs as SPARSE sums (the conversion matrices
  are static 0/1-ish numpy tables, so q_t = sum of the source-class planes
  mapped to t — no matmul, no zero terms) -> accumulate over models ->
  argmax/max over the T target planes -> per-class kc threshold -> ignore.

Both fusion families are first-class (SURVEY.md App. A): soft (mean of
converted probability maps — the paper's headline mode) and hard (per-model
argmax over the converted T+1 planes, one-hot votes, majority with
disagreement -> ignore).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mspl_tpu.utils.registry import IGNORE_LABEL


def _pick_hblock(h: int, target: int = 64) -> Optional[int]:
    for cand in (target, 32, 16, 8):
        if h % cand == 0:
            return cand
    return None


def _model_probs(x, conv, n_cols):
    """Softmax + sparse label-space conversion for one model's block.

    x [C_m, hb, W] f32; conv static numpy [C_m, T+1].  Returns a list of
    `n_cols` converted probability planes (None where the column has no
    mass).  One whole-stack subtract+exp instead of one per class: the
    class planes are row-stacked [C_m*hb, W] (hb % 8 == 0 keeps the merge
    layout-free), the shared max is tiled to match."""
    c_m = conv.shape[0]
    hb = x.shape[1]
    planes = [x[c] for c in range(c_m)]
    mx = planes[0]
    for pplane in planes[1:]:
        mx = jnp.maximum(mx, pplane)
    stack = jnp.concatenate(planes, axis=0)
    mx_full = jnp.concatenate([mx] * c_m, axis=0)
    e_all = jnp.exp(stack - mx_full)
    exps = [e_all[c * hb:(c + 1) * hb, :] for c in range(c_m)]
    tot = exps[0]
    for e in exps[1:]:
        tot = tot + e
    inv = 1.0 / tot
    qs = []
    for t in range(n_cols):
        q = None
        for c in range(c_m):
            wgt = float(conv[c, t])
            if wgt == 0.0:
                continue
            term = exps[c] if wgt == 1.0 else exps[c] * wgt
            q = term if q is None else q + term
        qs.append(None if q is None else q * inv)
    return qs


def _running_argmax(planes):
    """(best, idx) over a list of planes; first max wins (jnp.argmax)."""
    lbl = jnp.zeros_like(planes[0], jnp.int32)
    best = planes[0]
    for t in range(1, len(planes)):
        better = planes[t] > best
        lbl = jnp.where(better, t, lbl)
        best = jnp.maximum(best, planes[t])
    return best, lbl


def _kernel(convs, n_t, ignore_label, conf_mode, mode, min_agree, *refs):
    """refs = [logits_1 .. logits_N, kc, out_label, out_conf].

    logits_m block [1, C_m, hb, W]; kc [1, T]; outputs [1, hb, W].
    convs: static numpy [C_m, T+1] tables (sparse-expanded at trace time).
    mode 'soft': fused = mean of converted probs, label/conf from the T
    target planes.  mode 'hard': per model argmax over all T+1 converted
    planes (incl. ignore), one-hot votes over the T target classes,
    label = vote argmax, disagreement (top < min_agree) -> ignore.
    """
    n_models = len(convs)
    kc_ref = refs[n_models]
    lbl_ref = refs[n_models + 1]
    conf_ref = refs[n_models + 2]

    if mode == "hard":
        votes = [None] * n_t
        for m, conv in enumerate(convs):
            x = refs[m][0].astype(jnp.float32)
            qs = _model_probs(x, conv, n_t + 1)
            zero = next(q for q in qs if q is not None) * 0.0
            qs = [zero if q is None else q for q in qs]
            _, lab_m = _running_argmax(qs)
            for t in range(n_t):
                v = (lab_m == t).astype(jnp.float32)
                votes[t] = v if votes[t] is None else votes[t] + v
        top, lbl = _running_argmax(votes)
        if conf_mode == "entropy":
            # vote distribution over T+1 outcomes (abstentions = ignore)
            tot = votes[0]
            for t in range(1, n_t):
                tot = tot + votes[t]
            inv_n = 1.0 / n_models
            xlogx = lambda p: jnp.where(
                p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0)
            s = xlogx((n_models - tot) * inv_n)
            for t in range(n_t):
                s = s + xlogx(votes[t] * inv_n)
            conf = 1.0 + s * (1.0 / float(np.log(n_t + 1)))
        else:
            conf = top * (1.0 / n_models)
        lbl = jnp.where(top >= min_agree, lbl, ignore_label)
        thr = jnp.zeros_like(conf)
        for t in range(n_t):
            thr = jnp.where(lbl == t, kc_ref[0, t], thr)
        lbl = jnp.where(conf >= thr, lbl, ignore_label)
        lbl_ref[0] = lbl
        conf_ref[0] = conf
        return

    fused = [None] * n_t
    for m, conv in enumerate(convs):
        x = refs[m][0].astype(jnp.float32)  # [C_m, hb, W]
        qs = _model_probs(x, conv, n_t)
        for t in range(n_t):
            if qs[t] is None:
                continue
            fused[t] = qs[t] if fused[t] is None else fused[t] + qs[t]

    scale = 1.0 / n_models
    zero = None
    for t in range(n_t):
        if fused[t] is not None:
            zero = fused[t] * 0.0
            break
    fused = [zero if f is None else f * scale for f in fused]

    best, lbl = _running_argmax(fused)

    if conf_mode == "entropy":
        # normalized anti-entropy over the full fused (T+1)-way distribution;
        # the ignore plane is recovered as 1 - sum(target planes) (each
        # model's converted probs sum to 1 over T+1 columns)
        tot = fused[0]
        for t in range(1, n_t):
            tot = tot + fused[t]
        p_ig = jnp.maximum(1.0 - tot, 0.0)
        xlogx = lambda p: jnp.where(
            p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0)
        s = xlogx(p_ig)
        for t in range(n_t):
            s = s + xlogx(fused[t])
        conf = 1.0 + s * (1.0 / float(np.log(n_t + 1)))
    else:
        conf = best

    thr = jnp.zeros_like(conf)
    for t in range(n_t):
        thr = jnp.where(lbl == t, kc_ref[0, t], thr)
    lbl = jnp.where(conf >= thr, lbl, ignore_label)
    lbl_ref[0] = lbl
    conf_ref[0] = conf


def fused_pseudo_cm(
    logits_cm: Sequence[jnp.ndarray],
    conversions: Sequence[np.ndarray],
    kc: Optional[jnp.ndarray],
    mode: str = "soft",
    min_agree: Optional[int] = None,
    ignore_label: int = IGNORE_LABEL,
    interpret: bool = False,
    conf_mode: str = "prob",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused pseudo-label pass on channel-major logits (soft or hard).

    logits_cm: N tensors [B, C_m, H, W]; conversions: N static numpy
    [C_m, T+1] tables; kc: [T] thresholds or None (no thresholding).
    Returns (label int32 [B,H,W], conf f32 [B,H,W]) — same semantics as
    fused_pseudo_pass(mode=mode) on NHWC logits.
    """
    if not logits_cm or len(logits_cm) != len(conversions):
        raise ValueError("need N>=1 matching logits/conversion pairs")
    if mode not in ("soft", "hard"):
        raise ValueError(f"unknown fusion mode '{mode}'")
    convs = [np.asarray(c, np.float32) for c in conversions]
    n_t = int(convs[0].shape[1]) - 1
    b, _, h, w = logits_cm[0].shape
    hb = _pick_hblock(h)
    interpret = interpret or jax.default_backend() == "cpu"
    if hb is None:
        raise ValueError(f"H={h} not divisible by 8; use the jnp path")
    kc_arr = (jnp.zeros((1, n_t), jnp.float32) if kc is None
              else jnp.broadcast_to(
                  jnp.asarray(kc, jnp.float32), (n_t,)).reshape(1, n_t))
    need = min_agree if min_agree is not None else (len(convs) // 2 + 1)

    grid = (b, h // hb)
    in_specs = [
        pl.BlockSpec((1, int(x.shape[1]), hb, w),
                     lambda i, j: (i, 0, j, 0))
        for x in logits_cm
    ]
    in_specs.append(pl.BlockSpec((1, n_t), lambda i, j: (0, 0)))
    out_spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0))
    lbl, conf = pl.pallas_call(
        partial(_kernel, convs, n_t, ignore_label, conf_mode, mode, need),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(*logits_cm, kc_arr)
    return lbl, conf


def fused_pseudo_soft_cm(logits_cm, conversions, kc,
                         ignore_label: int = IGNORE_LABEL,
                         interpret: bool = False,
                         conf_mode: str = "prob"):
    """Soft-fusion entry point (kept for existing call sites/benchmarks)."""
    return fused_pseudo_cm(logits_cm, conversions, kc, mode="soft",
                           ignore_label=ignore_label, interpret=interpret,
                           conf_mode=conf_mode)
