"""Device-side, jittable image/label transform pipeline (reference layer L3).

The reference's PIL-based `transforms/segmentation/data_transforms.py`
(SURVEY.md §2 "Transforms": Resize / RandomScale / RandomCrop / RandomFlip /
Normalize) runs in DataLoader worker processes on the host.  TPU-native, the
whole pipeline is a single fused XLA program over uint8 batches that were DMAd
to the device — no per-image host work beyond file decode (SURVEY.md §7
stage 4).

Key design point: RandomScale followed by RandomCrop would need dynamic
shapes under jit.  We fuse them into one `jax.image.scale_and_translate`
sampling step instead: sample a scale factor, pick a crop window of size
crop/scale in source coordinates, and resample that window directly to the
static crop size.  Random horizontal flip is an elementwise reverse.  Labels
travel through the same window with nearest sampling; out-of-window pixels
(windows larger than the image at small scales) become the ignore label via a
+1 shift trick (0 = out-of-bounds sentinel).

All functions take explicit PRNG keys (functional randomness) and vmap over
the batch dimension.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mspl_tpu.ops.resize import resize_bilinear, resize_nearest
from mspl_tpu.utils.registry import IGNORE_LABEL, IMAGENET_MEAN, IMAGENET_STD


def normalize(
    img: jnp.ndarray,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> jnp.ndarray:
    """uint8/float [..,C] image in [0,255] → normalized float32.

    Channels beyond len(mean) (e.g. the RGB-D depth channel) are normalized
    with mean 0.5 / std 0.5, mapping [0,255] → [-1, 1]."""
    img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    c = img.shape[-1]
    if c > mean.shape[0]:
        extra = c - mean.shape[0]
        mean = jnp.concatenate([mean, jnp.full((extra,), 0.5, jnp.float32)])
        std = jnp.concatenate([std, jnp.full((extra,), 0.5, jnp.float32)])
    return (img - mean) / std


def _scale_translate(img, out_hw, scale, translation, method):
    return jax.image.scale_and_translate(
        img,
        shape=(*out_hw, img.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.asarray(scale, jnp.float32),
        translation=jnp.asarray(translation, jnp.float32),
        method=method,
        antialias=False,
    )


def random_scale_crop_flip(
    img: jnp.ndarray,
    label: jnp.ndarray,
    crop_hw: Tuple[int, int],
    key: jax.Array,
    scale_range: Tuple[float, float] = (0.5, 2.0),
    ignore_label: int = IGNORE_LABEL,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused RandomScale + RandomCrop + RandomFlip for one image.

    img: [H, W, 3] float (already normalized or raw), label: [H, W] int.
    Returns ([ch, cw, 3] float32, [ch, cw] int32).
    """
    h, w = img.shape[0], img.shape[1]
    ch, cw = crop_hw
    k_scale, k_y, k_x, k_flip = jax.random.split(key, 4)

    s = jax.random.uniform(
        k_scale, (), minval=scale_range[0], maxval=scale_range[1]
    )
    # crop window size in source coordinates
    win_h = ch / s
    win_w = cw / s
    y0 = jax.random.uniform(k_y, ()) * jnp.maximum(h - win_h, 0.0)
    x0 = jax.random.uniform(k_x, ()) * jnp.maximum(w - win_w, 0.0)

    # scale_and_translate maps output center (o+0.5) to input coordinate
    # (o + 0.5 - translation)/scale; shifting by the window origin means
    # translation = -origin * scale.
    scale = (s, s)
    translation = (-y0 * s, -x0 * s)

    out_img = _scale_translate(img.astype(jnp.float32), (ch, cw), scale,
                               translation, "linear")

    # labels: nearest sampling through the SAME window mapping, done with
    # explicit gathers (scale_and_translate has no nearest mode); pixels whose
    # source coordinate falls outside the image become the ignore label.
    src_y = (jnp.arange(ch, dtype=jnp.float32) + 0.5) / s + y0
    src_x = (jnp.arange(cw, dtype=jnp.float32) + 0.5) / s + x0
    yi = jnp.floor(src_y).astype(jnp.int32)
    xi = jnp.floor(src_x).astype(jnp.int32)
    oob = (yi < 0)[:, None] | (yi >= h)[:, None] | (xi < 0)[None, :] | (
        xi >= w
    )[None, :]
    gathered = jnp.take(
        jnp.take(label.astype(jnp.int32), jnp.clip(yi, 0, h - 1), axis=0),
        jnp.clip(xi, 0, w - 1),
        axis=1,
    )
    out_lab = jnp.where(oob, ignore_label, gathered)

    flip = jax.random.bernoulli(k_flip, 0.5)
    out_img = jnp.where(flip, out_img[:, ::-1, :], out_img)
    out_lab = jnp.where(flip, out_lab[:, ::-1], out_lab)
    return out_img, out_lab


def train_transform(
    imgs: jnp.ndarray,
    labels: jnp.ndarray,
    crop_hw: Tuple[int, int],
    key: jax.Array,
    scale_range: Tuple[float, float] = (0.5, 2.0),
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched train-time pipeline: normalize → scale/crop/flip.

    imgs: [B, H, W, 3] uint8, labels: [B, H, W] int.  jit/vmap-fused.
    """
    imgs = normalize(imgs, mean, std)
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(
        lambda i, l, k: random_scale_crop_flip(i, l, crop_hw, k, scale_range)
    )(imgs, labels, keys)


def eval_transform(
    imgs: jnp.ndarray,
    size_hw: Tuple[int, int],
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> jnp.ndarray:
    """Eval/inference pipeline: resize (half-pixel bilinear) → normalize."""
    imgs = normalize(imgs, mean, std)
    return resize_bilinear(imgs, size_hw, align_corners=False)


def eval_label_transform(labels: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    return resize_nearest(labels, size_hw)
