"""Segmentation losses (reference `loss_fns/`, SURVEY.md §2 "Loss functions"):
cross-entropy with ignore_index=255 and optional per-class weights, plus the
CRST-style confidence regularizers added on pseudo-labeled pixels
(SURVEY.md App. A: "CRST variant adds a confidence regularizer (e.g. KLD to
uniform) to the fine-tune loss on pseudo-pixels").

All losses are mean-over-valid-pixels, computed in fp32 regardless of the
model compute dtype, and jit/shard-safe (masking instead of boolean
indexing; no dynamic shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mspl_tpu.utils.registry import IGNORE_LABEL


def compute_class_weights(
    label_histogram: np.ndarray, norm_const: float = 1.02
) -> np.ndarray:
    """Inverse-log-frequency class weights: w_c = 1 / ln(norm + freq_c)
    (the ESPNet/ENet weighting the reference's class-weight files follow)."""
    hist = np.asarray(label_histogram, np.float64)
    freq = hist / np.maximum(hist.sum(), 1.0)
    return (1.0 / np.log(norm_const + freq)).astype(np.float32)


def segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_label: int = IGNORE_LABEL,
    reg_mode: str = "none",  # 'none' | 'kld' | 'ent'  (CRST MRKLD / MRENT)
    reg_weight: float = 0.0,
    batch_mask: Optional[jnp.ndarray] = None,
    channel_axis: int = -1,
) -> jnp.ndarray:
    """Mean cross-entropy over non-ignored pixels.

    logits: [B, H, W, C] (any float dtype; upcast to fp32), labels: [B, H, W].
    `batch_mask`: optional [B] bool — False rows (padded tail samples)
    contribute nothing.  `channel_axis=1` accepts channel-major
    [B, C, H, W] logits (the cm_decoder train layout) without transposing
    them — the whole computation is re-expressed with C on axis 1, values
    identical.
    """
    if channel_axis == 1:
        b, c, h, w = logits.shape
    else:
        b, h, w, c = logits.shape
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=channel_axis)

    valid = labels != ignore_label
    if batch_mask is not None:
        valid = valid & batch_mask[:, None, None]
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    # One-hot contraction instead of take_along_axis: the per-pixel gather
    # (and its scatter-add backward) lowers to a serial T(1024) op on TPU —
    # measured 120 ms/step at batch 64, 43% of the whole train step.  The
    # one-hot multiply-reduce is a lane-parallel VPU op over the same array.
    if channel_axis == 1:
        onehot = (safe_labels[:, None] ==
                  jnp.arange(c, dtype=jnp.int32)[None, :, None, None]
                  ).astype(jnp.float32)
        cw_bcast = (None if class_weights is None
                    else jnp.asarray(class_weights,
                                     jnp.float32)[None, :, None, None])
    else:
        onehot = (safe_labels[..., None] ==
                  jnp.arange(c, dtype=jnp.int32)).astype(jnp.float32)
        cw_bcast = (None if class_weights is None
                    else jnp.asarray(class_weights, jnp.float32))
    pixel_loss = -(logp * onehot).sum(axis=channel_axis)

    if cw_bcast is not None:
        wts = (onehot * cw_bcast).sum(axis=channel_axis)
    else:
        wts = jnp.ones_like(pixel_loss)
    wts = jnp.where(valid, wts, 0.0)

    denom = jnp.maximum(wts.sum(), 1e-8)
    loss = (pixel_loss * wts).sum() / denom

    if reg_mode != "none" and reg_weight > 0.0:
        p = jnp.exp(logp)
        if reg_mode == "kld":
            # KLD(p || uniform) up to a constant = -mean(log p)/C  — pushes
            # predictions on pseudo-pixels toward smoother distributions
            reg = -logp.mean(axis=channel_axis) / 1.0
            reg = reg / c
        elif reg_mode == "ent":
            reg = (p * logp).sum(axis=channel_axis)  # negative entropy
            reg = reg / c
        else:
            raise ValueError(f"unknown reg_mode '{reg_mode}'")
        mask_f = valid.astype(jnp.float32)
        reg_term = (reg * mask_f).sum() / jnp.maximum(mask_f.sum(), 1e-8)
        loss = loss + reg_weight * reg_term

    return loss
