"""Convolution building blocks (reference layer L1, SURVEY.md §1/§2).

Re-implements the public surface of the reference's `nn_layers/cnn_utils.py`
(`CBR`, `CB`, `C`, `CDilated`, `BR` — SURVEY.md §2 "Conv primitives") as Flax
linen modules, designed TPU-first:

* NHWC layout throughout (XLA's preferred TPU conv layout);
* explicit symmetric padding = dilation * (k-1)/2, matching torch
  ``Conv2d(padding=d*(k-1)//2)`` semantics so fp32 parity tests against the
  in-repo torch oracle are exact;
* BatchNorm with torch semantics (eps=1e-5, running-stat momentum 0.1 ==
  flax momentum 0.9);
* per-channel PReLU (torch ``nn.PReLU(nOut)`` semantics, init 0.25).

All blocks take ``train: bool`` to select batch-vs-running BN statistics; the
``batch_stats`` collection must be marked mutable during training.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspl_tpu.layers.bn import BatchNorm

# torch BatchNorm2d defaults
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum(0.1)


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class PReLU(nn.Module):
    """Per-channel PReLU: y = max(x, 0) + alpha_c * min(x, 0); alpha init 0.25.

    ``cm=True`` treats the input as channel-major [B, C, H, W] (the train
    decoder's layout, ops/cm_ops.py); the parameter tree is identical."""

    features: int
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, 0.25, jnp.float32), (self.features,)
        )
        alpha = alpha.astype(x.dtype)
        if self.cm:
            alpha = alpha[:, None, None]
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class _CMConv(nn.Module):
    """Channel-major conv leaf ([B, C, H, W] in/out, ops/cm_ops.py).

    Parameter names and shapes ('kernel' HWIO, optional 'bias') match
    ``nn.Conv``/``_GroupedConv`` exactly, so a checkpoint trained through
    either layout path loads into the other bit-for-bit.  Decoder-only
    scope: stride 1, dilation 1, kernel size 1 or 3."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    dilation: Tuple[int, int]
    groups: int
    use_bias: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mspl_tpu.ops.cm_ops import cm_conv1x1, cm_conv3x3

        kh, kw = self.kernel_size
        if (self.stride != (1, 1) or self.dilation != (1, 1)
                or (kh, kw) not in ((1, 1), (3, 3))):
            raise NotImplementedError(
                f"channel-major conv supports stride 1 / dilation 1 / k in "
                f"{{1,3}}; got k={self.kernel_size} s={self.stride} "
                f"d={self.dilation}")
        cin = x.shape[1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (kh, kw, cin // self.groups, self.features), jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if (kh, kw) == (1, 1):
            return cm_conv1x1(x, kernel, groups=self.groups, bias=bias)
        out = cm_conv3x3(x, kernel, groups=self.groups)
        if bias is not None:
            out = out + bias.astype(out.dtype)[:, None, None]
        return out


class _GroupedConv(nn.Module):
    """Grouped-conv leaf that bypasses XLA's slow feature_group_count path
    (see mspl_tpu/ops/grouped_conv.py header for measurements).  Parameter
    names and shapes ('kernel' HWIO, optional 'bias') match ``nn.Conv`` so
    the variable tree is identical to the dense-path leaf."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    dilation: Tuple[int, int]
    groups: int
    use_bias: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mspl_tpu.ops.grouped_conv import grouped_conv2d

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (kh, kw, x.shape[-1] // self.groups, self.features), jnp.float32,
        )
        out = grouped_conv2d(
            x, kernel.astype(x.dtype), stride=self.stride,
            dilation=self.dilation, groups=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


class C(nn.Module):
    """Plain conv, no BN/activation, no bias (reference `C`).

    ``cm=True``: channel-major [B, C, H, W] input/output (train-decoder
    layout); same parameter tree as the NHWC paths."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        d = _pair(self.dilation)
        if self.cm:
            return _CMConv(
                features=self.features, kernel_size=k,
                stride=_pair(self.stride), dilation=d, groups=self.groups,
                use_bias=self.use_bias, name="Conv_0",
            )(x)
        if self.groups > 1:
            return _GroupedConv(
                features=self.features, kernel_size=k,
                stride=_pair(self.stride), dilation=d, groups=self.groups,
                use_bias=self.use_bias, name="Conv_0",
            )(x)
        pad = ((d[0] * (k[0] - 1) // 2,) * 2, (d[1] * (k[1] - 1) // 2,) * 2)
        # dtype=x.dtype: like BatchNorm, flax Conv otherwise promotes bf16
        # activations to fp32 through the fp32 params.
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=pad,
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_normal(),
            dtype=x.dtype,
        )(x)


class CDilated(nn.Module):
    """Dilated conv (reference `CDilated`); with groups == features it is the
    dilated depthwise 3x3 used inside EESP branches (SURVEY.md §2 "EESP unit")."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return C(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
        )(x)


class BR(nn.Module):
    """BatchNorm + PReLU (reference `BR`).

    ``cm=True``: channel-major [B, C, H, W] (feature axis 1); parameter
    tree unchanged.  Incompatible with ``bn_stat_groups`` > 1 (the grouped
    unsynced-BN path supports axis -1 only — layers/bn.py)."""

    features: int
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # dtype=x.dtype: flax BatchNorm otherwise promotes bf16 activations
        # to fp32 (params are fp32), silently doubling HBM traffic for the
        # whole network downstream of every BN.  Statistics stay fp32 in
        # batch_stats (param_dtype default).
        x = BatchNorm(
            use_running_average=not train, momentum=_BN_MOMENTUM,
            epsilon=_BN_EPS, dtype=x.dtype, axis=1 if self.cm else -1,
        )(x)
        return PReLU(self.features, cm=self.cm)(x)


class CB(nn.Module):
    """Conv + BatchNorm (reference `CB`).  ``cm``: see ``BR``."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = C(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
            cm=self.cm,
        )(x)
        return BatchNorm(
            use_running_average=not train, momentum=_BN_MOMENTUM,
            epsilon=_BN_EPS, dtype=x.dtype, axis=1 if self.cm else -1,
        )(x)


class CBR(nn.Module):
    """Conv + BatchNorm + PReLU (reference `CBR`).  ``cm``: see ``BR``."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = CB(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=self.groups,
            cm=self.cm,
        )(x, train=train)
        return PReLU(self.features, cm=self.cm)(x)
