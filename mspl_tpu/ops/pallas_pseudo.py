"""Pallas TPU kernel: fused softmax → label-space conversion → multi-source
fusion → class-balanced threshold over HBM-resident logits.

This is the north-star hot op (BASELINE.json:5: "pseudo-label generation ...
fuses into a single Pallas pass over HBM-resident logit tensors"; reference
call stack SURVEY.md §3.2).  The jnp reference implementation lives in
mspl_tpu/pseudo/generate.py::fused_pseudo_pass; this kernel must match it
bit-tolerantly (tests/test_pallas.py) and is switched in via
`use_pallas=True`.

Layout: per-model logits are flattened to [P, C_m] pixel-major blocks
(P = B*H*W).  The grid tiles P; each step processes a [TILE_P, C_m] block per
model in VMEM:

    fp32 softmax along lanes (C) → [TILE_P, C_m] @ [C_m, T+1] conversion
    matmul (MXU) → accumulate across models (soft) or one-hot vote of the
    per-model argmax (hard) → target-class argmax + confidence → per-class
    kc threshold (unrolled select over the tiny T) → int32 labels + f32 conf.

C_m is 5..19 (source label spaces) so lanes are padded by Mosaic; the arrays
DMA'd from HBM stay compact.  TILE_P = 1024 keeps VMEM under ~2 MB/model with
double buffering.  All reductions are lane-wise VPU ops; the conversion
matmul is the only MXU op.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mspl_tpu.utils.registry import IGNORE_LABEL

TILE_P = 1024


def _entropy_conf(dist: jnp.ndarray) -> jnp.ndarray:
    """Normalized anti-entropy over lanes — matches
    generate.entropy_confidence (1 - H/ln(K))."""
    xlogx = jnp.where(dist > 0, dist * jnp.log(jnp.maximum(dist, 1e-30)), 0.0)
    return 1.0 + jnp.sum(xlogx, axis=-1) / float(np.log(dist.shape[-1]))


def _kernel(n_models: int, num_target: int, mode: str, min_agree: int,
            ignore_label: int, has_kc: bool, conf_mode: str, *refs):
    """refs = [logits_0..logits_{N-1}, mat_0..mat_{N-1}, (kc,), out_label,
    out_conf]"""
    logits_refs = refs[:n_models]
    mat_refs = refs[n_models: 2 * n_models]
    pos = 2 * n_models
    kc_ref = refs[pos] if has_kc else None
    pos += 1 if has_kc else 0
    out_label_ref = refs[pos]
    out_conf_ref = refs[pos + 1]

    t = num_target
    acc = None
    for m in range(n_models):
        x = logits_refs[m][:].astype(jnp.float32)  # [TILE_P, C_m]
        x = x - jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        q = jnp.dot(p, mat_refs[m][:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)  # [TILE_P, T+1]
        if mode == "soft":
            acc = q if acc is None else acc + q
        else:  # hard: one-hot vote of this model's target-space argmax
            lab_m = jnp.argmax(q, axis=-1)  # may be t (ignore column)
            cols = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], t), 1)
            onehot = (lab_m[:, None] == cols).astype(jnp.float32)
            acc = onehot if acc is None else acc + onehot

    if mode == "soft":
        fused = acc / n_models
        tgt = fused[:, :t]
        label = jnp.argmax(tgt, axis=-1).astype(jnp.int32)
        if conf_mode == "entropy":
            conf = _entropy_conf(fused)
        else:
            conf = jnp.max(tgt, axis=-1)
    else:
        label = jnp.argmax(acc, axis=-1).astype(jnp.int32)
        top = jnp.max(acc, axis=-1)
        if conf_mode == "entropy":
            ig = (n_models - jnp.sum(acc, axis=-1, keepdims=True))
            dist = jnp.concatenate([acc, ig], axis=-1) / n_models
            conf = _entropy_conf(dist)
        else:
            conf = top / n_models
        label = jnp.where(top >= min_agree, label, ignore_label)

    if has_kc:
        # per-class threshold without a gather: unrolled select over tiny T
        thr = jnp.zeros_like(conf)
        for c in range(t):
            thr = jnp.where(label == c, kc_ref[0, c], thr)
        label = jnp.where(conf >= thr, label, ignore_label)

    out_label_ref[:] = label[:, None]
    out_conf_ref[:] = conf[:, None]


def fused_pseudo_pass_pallas(
    logits_list: Sequence[jnp.ndarray],
    conversions: Sequence[np.ndarray],
    mode: str = "soft",
    kc: Optional[jnp.ndarray] = None,
    min_agree: Optional[int] = None,
    ignore_label: int = IGNORE_LABEL,
    interpret: bool = False,
    conf_mode: str = "prob",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas equivalent of generate.fused_pseudo_pass.

    logits_list: N tensors [B,H,W,C_m]; conversions: N [C_m, T+1] matrices.
    Returns (label int32 [B,H,W], conf f32 [B,H,W]).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    if not logits_list:
        raise ValueError("need at least one source model")
    n_models = len(logits_list)
    shape = logits_list[0].shape[:-1]  # B,H,W
    p_total = int(np.prod(shape))
    t = int(conversions[0].shape[1]) - 1
    need = min_agree if min_agree is not None else (n_models // 2 + 1)

    p_pad = -(-p_total // TILE_P) * TILE_P
    flats = []
    for lg in logits_list:
        f = lg.reshape(p_total, lg.shape[-1])
        if p_pad != p_total:
            f = jnp.pad(f, ((0, p_pad - p_total), (0, 0)))
        flats.append(f)
    mats = [jnp.asarray(c, jnp.float32) for c in conversions]

    grid = (p_pad // TILE_P,)
    in_specs = [
        pl.BlockSpec((TILE_P, f.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for f in flats
    ] + [
        pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for m in mats
    ]
    args = flats + mats
    has_kc = kc is not None
    if has_kc:
        kc_arr = jnp.broadcast_to(
            jnp.asarray(kc, jnp.float32), (t,)
        ).reshape(1, t)
        in_specs.append(
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(kc_arr)

    out_shape = (
        jax.ShapeDtypeStruct((p_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((TILE_P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )

    kernel = partial(_kernel, n_models, t, mode, need, ignore_label, has_kc,
                     conf_mode)
    label, conf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    label = label[:p_total, 0].reshape(shape)
    conf = conf[:p_total, 0].reshape(shape)
    return label, conf
