"""DeepLab-family alternative segmentation backbone (reference layer L2,
SURVEY.md §2 "DeepLab-family alt backbone": ResNet encoder + ASPP — parallel
dilated convs + image pooling — used for the backbone-swap experiments of
BASELINE.json:11 / config #5).

Built from scratch in Flax, TPU-first (NHWC, static shapes, bf16-capable):

* `ResNetEncoder`: stem 7x7/s2 + maxpool, four bottleneck stages; the last
  stage uses stride 1 with dilation 2 so the encoder output stride is 16
  (DeepLabv3 convention).
* `ASPP`: 1x1 conv, three 3x3 convs with dilations (6, 12, 18), and a
  global-average "image pooling" branch, concatenated and projected.
* `DeepLabV3`: encoder → ASPP → 1x1 classifier → bilinear upsample to input
  resolution (align_corners=True, matching the decoder convention pinned in
  SURVEY.md §7 "Resize parity").
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspl_tpu.ops.resize import resize_bilinear

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9


class _BN(nn.Module):
    """BatchNorm pinned to the activation dtype — flax's default promotes
    bf16 activations to fp32 via the fp32 params (see conv_blocks)."""

    train: bool

    @nn.compact
    def __call__(self, x):
        from mspl_tpu.layers.bn import BatchNorm

        return BatchNorm(use_running_average=not self.train,
                         momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                         dtype=x.dtype)(x)


def _bn(train: bool):
    return _BN(train)


class _Conv(nn.Module):
    """Conv pinned to the activation dtype (see _BN)."""

    features: int
    k: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.k - 1) // 2
        return nn.Conv(self.features, (self.k, self.k),
                       strides=(self.stride, self.stride),
                       padding=((pad, pad), (pad, pad)),
                       kernel_dilation=(self.dilation, self.dilation),
                       use_bias=False,
                       kernel_init=nn.initializers.he_normal(),
                       dtype=x.dtype)(x)


def _conv(features: int, k: int, stride: int = 1, dilation: int = 1,
          name: str | None = None):
    return _Conv(features, k, stride, dilation, name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = self.planes * self.expansion
        residual = x
        y = _conv(self.planes, 1)(x)
        y = nn.relu(_bn(train)(y))
        y = _conv(self.planes, 3, self.stride, self.dilation)(y)
        y = nn.relu(_bn(train)(y))
        y = _conv(out_ch, 1)(y)
        y = _bn(train)(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = _conv(out_ch, 1, self.stride, name="downsample")(x)
            residual = _bn(train)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """ResNet-50-style bottleneck encoder, output stride 16."""

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = _conv(self.width, 7, 2, name="stem")(x)
        y = nn.relu(_bn(train)(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        plan = [  # (planes, stride, dilation) per stage
            (self.width, 1, 1),
            (self.width * 2, 2, 1),
            (self.width * 4, 2, 1),
            (self.width * 8, 1, 2),  # dilated final stage => output stride 16
        ]
        low = None
        for si, ((planes, stride, dilation), blocks) in enumerate(
            zip(plan, self.stage_blocks)
        ):
            for bi in range(blocks):
                y = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    name=f"stage{si}_{bi}",
                )(y, train=train)
            if si == 0:
                low = y  # 1/4-resolution tap for the decoder
        return low, y


class ASPP(nn.Module):
    features: int = 256
    rates: Sequence[int] = (6, 12, 18)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        branches = [nn.relu(_bn(train)(_conv(self.features, 1)(x)))]
        for r in self.rates:
            branches.append(nn.relu(_bn(train)(_conv(self.features, 3, 1, r)(x))))
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.relu(_bn(train)(_conv(self.features, 1)(g)))
        g = jnp.broadcast_to(g, (x.shape[0], h, w, self.features))
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.relu(_bn(train)(_conv(self.features, 1, name="project")(y)))
        return y


class DeepLabV3(nn.Module):
    """DeepLabv3+ style segmentation model with a light decoder."""

    num_classes: int
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    aspp_features: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        img = x.astype(self.compute_dtype)
        low, deep = ResNetEncoder(self.stage_blocks, name="encoder")(img, train=train)
        y = ASPP(self.aspp_features, name="aspp")(deep, train=train)
        # decoder: upsample to the 1/4 tap, merge, classify
        y = resize_bilinear(y, (low.shape[1], low.shape[2]), align_corners=True)
        low = nn.relu(_bn(train)(_conv(48, 1, name="low_proj")(low)))
        y = jnp.concatenate([y, low], axis=-1)
        y = nn.relu(_bn(train)(_conv(self.aspp_features, 3, name="fuse")(y)))
        y = nn.Conv(self.num_classes, (1, 1), name="classifier")(y)
        y = resize_bilinear(y, (x.shape[1], x.shape[2]), align_corners=True)
        return y.astype(jnp.float32)
