"""Torch-CPU numerical oracle for the DeepLab-family backbone
(mspl_tpu/models/deeplab.py; SURVEY.md §2 "DeepLab-family alt backbone").

Like oracle/torch_espnetv2.py, this is a deliberately torch-idiomatic twin
of the flax model — test/anchor-only, never imported by the framework.  It
stands in for the unavailable reference (SURVEY.md §0) so "mIoU parity at
fp32" (BASELINE.json:5) is enforceable for config #5's backbone swap too:
weights are transplanted from the flax variable tree and logits compared.

Conventions mirrored from the flax model:
  * conv padding = dilation * (k - 1) // 2, no bias (except classifier)
  * BN eps 1e-5; bottleneck downsample on channel/stride mismatch
  * final stage stride 1 / dilation 2 => output stride 16
  * ASPP: 1x1 + three dilated 3x3 (6, 12, 18) + image pooling, project
  * decoder: upsample(align_corners=True) to the 1/4 tap, 48-ch low_proj,
    concat, 3x3 fuse, 1x1 classifier, upsample to input resolution
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _conv(nin, nout, k, stride=1, dilation=1, bias=False):
    return nn.Conv2d(nin, nout, k, stride=stride,
                     padding=dilation * (k - 1) // 2, dilation=dilation,
                     bias=bias)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, nin, planes, stride=1, dilation=1):
        super().__init__()
        out_ch = planes * self.expansion
        self.conv1 = _conv(nin, planes, 1)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = _conv(planes, planes, 3, stride, dilation)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = _conv(planes, out_ch, 1)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if nin != out_ch or stride != 1:
            self.downsample = nn.Sequential(
                _conv(nin, out_ch, 1, stride), nn.BatchNorm2d(out_ch))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = x if self.downsample is None else self.downsample(x)
        return F.relu(y + r)


class TResNetEncoder(nn.Module):
    def __init__(self, stage_blocks: Sequence[int] = (3, 4, 6, 3),
                 width: int = 64):
        super().__init__()
        self.stem = _conv(3, width, 7, 2)
        self.stem_bn = nn.BatchNorm2d(width)
        plan = [(width, 1, 1), (width * 2, 2, 1), (width * 4, 2, 1),
                (width * 8, 1, 2)]
        nin = width
        self.stages = nn.ModuleList()
        for (planes, stride, dilation), blocks in zip(plan, stage_blocks):
            stage = nn.ModuleList()
            for bi in range(blocks):
                stage.append(TBottleneck(
                    nin, planes, stride=stride if bi == 0 else 1,
                    dilation=dilation))
                nin = planes * TBottleneck.expansion
            self.stages.append(stage)

    def forward(self, x):
        y = F.relu(self.stem_bn(self.stem(x)))
        y = F.max_pool2d(y, 3, stride=2, padding=1)
        low = None
        for si, stage in enumerate(self.stages):
            for blk in stage:
                y = blk(y)
            if si == 0:
                low = y
        return low, y


class TASPP(nn.Module):
    def __init__(self, nin, features=256, rates=(6, 12, 18)):
        super().__init__()
        self.b0 = _conv(nin, features, 1)
        self.bn0 = nn.BatchNorm2d(features)
        self.bs = nn.ModuleList(
            [_conv(nin, features, 3, 1, r) for r in rates])
        self.bns = nn.ModuleList(
            [nn.BatchNorm2d(features) for _ in rates])
        self.gp = _conv(nin, features, 1)
        self.gp_bn = nn.BatchNorm2d(features)
        self.project = _conv(features * (len(rates) + 2), features, 1)
        self.project_bn = nn.BatchNorm2d(features)

    def forward(self, x):
        h, w = x.shape[2], x.shape[3]
        outs = [F.relu(self.bn0(self.b0(x)))]
        for conv, bn in zip(self.bs, self.bns):
            outs.append(F.relu(bn(conv(x))))
        g = x.mean(dim=(2, 3), keepdim=True)
        g = F.relu(self.gp_bn(self.gp(g)))
        outs.append(g.expand(-1, -1, h, w))
        y = torch.cat(outs, dim=1)
        return F.relu(self.project_bn(self.project(y)))


class TDeepLabV3(nn.Module):
    def __init__(self, num_classes: int,
                 stage_blocks: Sequence[int] = (3, 4, 6, 3),
                 aspp_features: int = 256, width: int = 64):
        super().__init__()
        self.encoder = TResNetEncoder(stage_blocks, width)
        deep_ch = width * 8 * TBottleneck.expansion
        low_ch = width * TBottleneck.expansion
        self.aspp = TASPP(deep_ch, aspp_features)
        self.low_proj = _conv(low_ch, 48, 1)
        self.low_bn = nn.BatchNorm2d(48)
        self.fuse = _conv(aspp_features + 48, aspp_features, 3)
        self.fuse_bn = nn.BatchNorm2d(aspp_features)
        self.classifier = nn.Conv2d(aspp_features, num_classes, 1, bias=True)

    def forward(self, x):
        low, deep = self.encoder(x)
        y = self.aspp(deep)
        y = F.interpolate(y, size=(low.shape[2], low.shape[3]),
                          mode="bilinear", align_corners=True)
        lo = F.relu(self.low_bn(self.low_proj(low)))
        y = torch.cat([y, lo], dim=1)
        y = F.relu(self.fuse_bn(self.fuse(y)))
        y = self.classifier(y)
        return F.interpolate(y, size=(x.shape[2], x.shape[3]),
                             mode="bilinear", align_corners=True)


# ---------------------------------------------------------------------------
# flax -> torch weight transplant (tree layout printed from
# jax.eval_shape(DeepLabV3.init): _Conv_i/Conv_0 + _BN_i/BatchNorm_0 pairs
# in call order, explicit names for stem/downsample/project/low_proj/fuse/
# classifier, stages as encoder/stage{si}_{bi})
# ---------------------------------------------------------------------------

def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _load_conv(conv: nn.Conv2d, leaf):
    conv.weight.data = _t(leaf["kernel"]).permute(3, 2, 0, 1).contiguous()
    if conv.bias is not None:
        conv.bias.data = _t(leaf.get("bias", np.zeros(conv.out_channels)))


def _load_bn(bn: nn.BatchNorm2d, p, s):
    b = p["BatchNorm_0"]
    st = s["BatchNorm_0"]
    bn.weight.data = _t(b["scale"])
    bn.bias.data = _t(b["bias"])
    bn.running_mean.data = _t(st["mean"])
    bn.running_var.data = _t(st["var"])


def _load_bottleneck(mod: TBottleneck, p, s):
    _load_conv(mod.conv1, p["_Conv_0"]["Conv_0"])
    _load_bn(mod.bn1, p["_BN_0"], s["_BN_0"])
    _load_conv(mod.conv2, p["_Conv_1"]["Conv_0"])
    _load_bn(mod.bn2, p["_BN_1"], s["_BN_1"])
    _load_conv(mod.conv3, p["_Conv_2"]["Conv_0"])
    _load_bn(mod.bn3, p["_BN_2"], s["_BN_2"])
    if mod.downsample is not None:
        _load_conv(mod.downsample[0], p["downsample"]["Conv_0"])
        _load_bn(mod.downsample[1], p["_BN_3"], s["_BN_3"])


def _load_encoder(mod: TResNetEncoder, p, s):
    _load_conv(mod.stem, p["stem"]["Conv_0"])
    _load_bn(mod.stem_bn, p["_BN_0"], s["_BN_0"])
    for si, stage in enumerate(mod.stages):
        for bi, blk in enumerate(stage):
            name = f"stage{si}_{bi}"
            _load_bottleneck(blk, p[name], s[name])


def _load_aspp(mod: TASPP, p, s):
    _load_conv(mod.b0, p["_Conv_0"]["Conv_0"])
    _load_bn(mod.bn0, p["_BN_0"], s["_BN_0"])
    for i, (conv, bn) in enumerate(zip(mod.bs, mod.bns), start=1):
        _load_conv(conv, p[f"_Conv_{i}"]["Conv_0"])
        _load_bn(bn, p[f"_BN_{i}"], s[f"_BN_{i}"])
    _load_conv(mod.gp, p["_Conv_4"]["Conv_0"])
    _load_bn(mod.gp_bn, p["_BN_4"], s["_BN_4"])
    _load_conv(mod.project, p["project"]["Conv_0"])
    _load_bn(mod.project_bn, p["_BN_5"], s["_BN_5"])


def load_from_flax(model: TDeepLabV3, variables) -> None:
    """Transplant a flax DeepLabV3 variable tree into `model`."""
    p, s = variables["params"], variables["batch_stats"]
    _load_encoder(model.encoder, p["encoder"], s["encoder"])
    _load_aspp(model.aspp, p["aspp"], s["aspp"])
    _load_conv(model.low_proj, p["low_proj"]["Conv_0"])
    _load_bn(model.low_bn, p["_BN_0"], s["_BN_0"])
    _load_conv(model.fuse, p["fuse"]["Conv_0"])
    _load_bn(model.fuse_bn, p["_BN_1"], s["_BN_1"])
    _load_conv(model.classifier, p["classifier"])
    model.eval()
