"""Minimal torch-CPU numerical oracles for fp32 parity tests.

The reference repo is torch; since its checkout is empty (SURVEY.md §0),
parity is defined against these small, independently written torch ops
(SURVEY.md §7 "No reference weights available": same-ops determinism, not
checkpoint equality).  Only used inside tests — the framework itself never
imports torch.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def conv2d_nhwc(x_nhwc, w_hwio, stride=1, dilation=1, groups=1):
    """NHWC conv with torch semantics: pad = dilation*(k-1)/2, no bias.

    w_hwio: [kh, kw, cin_per_group, cout] (flax layout).
    """
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()
    # flax HWIO -> torch OIHW
    w = torch.from_numpy(np.transpose(w_hwio, (3, 2, 0, 1))).float()
    kh = w.shape[2]
    pad = dilation * (kh - 1) // 2
    y = F.conv2d(x, w, stride=stride, padding=pad, dilation=dilation, groups=groups)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def batchnorm_nhwc(x_nhwc, mean, var, scale, bias, eps=1e-5):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()
    y = F.batch_norm(
        x,
        torch.from_numpy(mean).float(),
        torch.from_numpy(var).float(),
        torch.from_numpy(scale).float(),
        torch.from_numpy(bias).float(),
        training=False,
        eps=eps,
    )
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def prelu_nhwc(x_nhwc, alpha):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()
    y = F.prelu(x, torch.from_numpy(alpha).float())
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def avgpool_3x3_s2(x_nhwc):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()
    y = F.avg_pool2d(x, kernel_size=3, stride=2, padding=1, count_include_pad=True)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def bilinear_resize(x_nhwc, size_hw, align_corners=True):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()
    y = F.interpolate(x, size=size_hw, mode="bilinear", align_corners=align_corners)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def adaptive_avg_pool(x_nhwc, size_hw):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))).float()
    y = F.adaptive_avg_pool2d(x, size_hw)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def softmax_channels(x_nhwc):
    x = torch.from_numpy(x_nhwc).float()
    return torch.softmax(x, dim=-1).numpy()
