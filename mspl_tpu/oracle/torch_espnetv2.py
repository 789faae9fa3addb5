"""Reference-equivalent ESPNetv2 segmentation model in PyTorch (CPU, NCHW).

This mirrors the behavioral spec of SURVEY.md §2/App. A (the same spec the
flax implementation in mspl_tpu/models/espnetv2.py is built from): CBR/CB/C
conv blocks with padding = dilation*(k-1)//2, BatchNorm2d(eps=1e-5),
per-channel PReLU, EESP units with the effective-receptive-field dilation
schedule + HFF, DownSampler with RGB reinforcement, EfficientPyrPool /
EfficientPWC decoder blocks, align_corners=True bilinear upsampling.

It is written in idiomatic torch (NCHW, nn.Module) precisely because its job
is to stand in for the PyTorch reference that is unavailable in this
environment (SURVEY.md §0): `load_from_flax` transplants a flax variable
tree so tests/test_torch_e2e_parity.py can assert fp32 end-to-end logits
parity, and bench_anchor.py measures the reference-equivalent pipeline
throughput that anchors bench.py's `vs_baseline`.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from mspl_tpu.layers.eesp import branch_dilations
from mspl_tpu.models.espnetv2 import (
    _STAGE_K,
    _STAGE_REPS,
    _STAGE_RLIM,
    eespnet_channel_plan,
)

_BN_EPS = 1e-5


def _conv(nin, nout, k, stride=1, dilation=1, groups=1, bias=False):
    pad = dilation * (k - 1) // 2
    return nn.Conv2d(nin, nout, k, stride=stride, padding=pad,
                     dilation=dilation, groups=groups, bias=bias)


class TC(nn.Module):
    """flax C: conv only (no BN/act)."""

    def __init__(self, nin, nout, k, stride=1, dilation=1, groups=1,
                 bias=False):
        super().__init__()
        self.conv = _conv(nin, nout, k, stride, dilation, groups, bias)

    def forward(self, x):
        return self.conv(x)


class TCB(nn.Module):
    def __init__(self, nin, nout, k, stride=1, dilation=1, groups=1):
        super().__init__()
        self.conv = _conv(nin, nout, k, stride, dilation, groups)
        self.bn = nn.BatchNorm2d(nout, eps=_BN_EPS)

    def forward(self, x):
        return self.bn(self.conv(x))


class TCBR(nn.Module):
    def __init__(self, nin, nout, k, stride=1, dilation=1, groups=1):
        super().__init__()
        self.cb = TCB(nin, nout, k, stride, dilation, groups)
        self.act = nn.PReLU(nout)

    def forward(self, x):
        return self.act(self.cb(x))


class TBR(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.bn = nn.BatchNorm2d(n, eps=_BN_EPS)
        self.act = nn.PReLU(n)

    def forward(self, x):
        return self.act(self.bn(x))


def _avg_pool_3x3_s2(x):
    return F.avg_pool2d(x, 3, stride=2, padding=1, count_include_pad=True)


class TEESP(nn.Module):
    def __init__(self, nin, nout, stride=1, k=4, r_lim=7, down_method="esp"):
        super().__init__()
        self.stride = stride
        self.down_method = down_method
        n = nout // k
        assert n * k == nout
        self.k = k
        groups = k if (nin % k == 0 and n % k == 0) else 1
        self.proj_1x1 = TCBR(nin, n, 1, groups=groups)
        self.dilations = branch_dilations(k, r_lim)
        self.branches = nn.ModuleList(
            [_conv(n, n, 3, stride=stride, dilation=d, groups=n)
             for d in self.dilations]
        )
        self.br_after_cat = TBR(nout)
        self.conv_1x1_exp = TCB(nout, nout, 1, groups=groups)
        self.module_act = nn.PReLU(nout)

    def forward(self, x, with_pool=False):
        proj = self.proj_1x1(x)
        outs = []
        for i, conv in enumerate(self.branches):
            b = conv(proj)
            if i > 0:
                b = b + outs[-1]  # hierarchical feature fusion
            outs.append(b)
        merged = torch.cat(outs, dim=1)
        merged = self.br_after_cat(merged)
        expanded = self.conv_1x1_exp(merged)
        if self.stride == 2 and self.down_method == "avg":
            if with_pool:
                return _avg_pool_3x3_s2(x), expanded
            return expanded
        if expanded.shape == x.shape:
            expanded = expanded + x
        return self.module_act(expanded)


class TDownSampler(nn.Module):
    def __init__(self, nin, nout, k=4, r_lim=9, reinf=True, img_ch=3):
        super().__init__()
        nout_new = nout - nin
        self.eesp = TEESP(nin, nout_new, stride=2, k=k, r_lim=r_lim,
                          down_method="avg")
        self.reinf = reinf
        if reinf:
            self.inp_reinf_cbr = TCBR(img_ch, img_ch, 3)
            self.inp_reinf_cb = TCB(img_ch, nout, 1)
        self.act = nn.PReLU(nout)

    def forward(self, x, img=None):
        avg_out, eesp_out = self.eesp(x, with_pool=True)
        out = torch.cat([avg_out, eesp_out], dim=1)
        if self.reinf and img is not None:
            while img.shape[2] != out.shape[2] or img.shape[3] != out.shape[3]:
                img = _avg_pool_3x3_s2(img)
            r = self.inp_reinf_cb(self.inp_reinf_cbr(img))
            out = out + r
        return self.act(out)


class TEESPNetEncoder(nn.Module):
    """Backbone encoder (strides 2/4/8/16 taps)."""

    def __init__(self, s=2.0, reinf=True):
        super().__init__()
        cfg = eespnet_channel_plan(s)
        self.reinf = reinf
        self.level1 = TCBR(3, cfg[0], 3, stride=2)
        self.level2_0 = TDownSampler(cfg[0], cfg[1], k=_STAGE_K[0],
                                     r_lim=_STAGE_RLIM[0], reinf=reinf)
        self.level3_0 = TDownSampler(cfg[1], cfg[2], k=_STAGE_K[1],
                                     r_lim=_STAGE_RLIM[1], reinf=reinf)
        self.level3_blocks = nn.ModuleList(
            [TEESP(cfg[2], cfg[2], k=_STAGE_K[2], r_lim=_STAGE_RLIM[2])
             for _ in range(_STAGE_REPS[1])]
        )
        self.level4_0 = TDownSampler(cfg[2], cfg[3], k=_STAGE_K[2],
                                     r_lim=_STAGE_RLIM[2], reinf=reinf)
        self.level4_blocks = nn.ModuleList(
            [TEESP(cfg[3], cfg[3], k=_STAGE_K[3], r_lim=_STAGE_RLIM[3])
             for _ in range(_STAGE_REPS[2])]
        )

    def forward(self, x):
        l1 = self.level1(x)
        img4 = _avg_pool_3x3_s2(_avg_pool_3x3_s2(x)) if self.reinf else x
        img8 = _avg_pool_3x3_s2(img4) if self.reinf else x
        img16 = _avg_pool_3x3_s2(img8) if self.reinf else x
        l2 = self.level2_0(l1, img4)
        l3 = self.level3_0(l2, img8)
        for blk in self.level3_blocks:
            l3 = blk(l3)
        l4 = self.level4_0(l3, img16)
        for blk in self.level4_blocks:
            l4 = blk(l4)
        return l1, l2, l3, l4


def _branch_size(size: int, s: float) -> int:
    return max(int(math.ceil(size * s)), 5)


class TEfficientPyrPool(nn.Module):
    def __init__(self, nin, proj, nout,
                 scales: Sequence[float] = (2.0, 1.5, 1.0, 0.5, 0.1),
                 last_layer_br=True):
        super().__init__()
        self.scales = tuple(sorted(scales, reverse=True))
        self.proj = TCBR(nin, proj, 1)
        self.p = proj
        self.dw = nn.ModuleList(
            [_conv(proj, proj, 3, groups=proj) for _ in self.scales]
        )
        cat = proj * len(self.scales)
        self.merge_br = TBR(cat)
        self.merge_cbr = TCBR(cat, proj, 3, groups=proj)
        self.classify = TC(proj, nout, 1, bias=not last_layer_br)
        self.last_layer_br = last_layer_br
        if last_layer_br:
            self.last_br = TBR(nout)

    def forward(self, x):
        x = self.proj(x)
        h, w = x.shape[2], x.shape[3]
        branches = []
        for s, conv in zip(self.scales, self.dw):
            hs, ws = _branch_size(h, s), _branch_size(w, s)
            if s < 1.0:
                y = F.adaptive_avg_pool2d(x, (hs, ws))
            elif s > 1.0:
                y = F.interpolate(x, size=(hs, ws), mode="bilinear",
                                  align_corners=True)
            else:
                y = x
            y = conv(y)
            if s != 1.0:
                y = F.interpolate(y, size=(h, w), mode="bilinear",
                                  align_corners=True)
            branches.append(y)
        out = torch.cat(branches, dim=1)
        out = self.merge_br(out)
        # channel shuffle across the scale groups
        b, c, hh, ww = out.shape
        g = len(self.scales)
        out = out.view(b, g, c // g, hh, ww).transpose(1, 2).reshape(
            b, c, hh, ww)
        out = self.merge_cbr(out)
        out = self.classify(out)
        if self.last_layer_br:
            out = self.last_br(out)
        return out


class TEfficientPWC(nn.Module):
    def __init__(self, nin, nout):
        super().__init__()
        self.wt_conv = TC(nin, nout, 1)
        self.expand = TCBR(nin, nout, 3, groups=math.gcd(nin, nout))

    def forward(self, x):
        gate = torch.sigmoid(self.wt_conv(x.mean(dim=(2, 3), keepdim=True)))
        return self.expand(x) * gate


class TESPNetv2Segmentation(nn.Module):
    """End-to-end torch twin of mspl_tpu.models.ESPNetv2Segmentation."""

    def __init__(self, num_classes: int, s: float = 2.0,
                 dec_base_planes: int = 16):
        super().__init__()
        cfg = eespnet_channel_plan(s)
        bp = dec_base_planes
        dec = (4 * bp, 3 * bp, 2 * bp, num_classes)
        proj = min(bp, max(num_classes // 2, 8))
        self.base_net = TEESPNetEncoder(s=s, reinf=True)
        self.bu_dec_l1 = TEfficientPyrPool(cfg[3], proj, dec[0])
        self.merge_l2 = TEfficientPWC(cfg[2], dec[0])
        self.bu_dec_l2 = TEfficientPyrPool(dec[0], proj, dec[1])
        self.merge_l3 = TEfficientPWC(cfg[1], dec[1])
        self.bu_dec_l3 = TEfficientPyrPool(dec[1], proj, dec[2])
        self.merge_l4 = TEfficientPWC(cfg[0], dec[2])
        self.bu_dec_l4 = TEfficientPyrPool(dec[2], proj, dec[3],
                                           last_layer_br=False)

    def forward(self, x):
        l1, l2, l3, l4 = self.base_net(x)

        def up_to(t, like):
            return F.interpolate(t, size=(like.shape[2], like.shape[3]),
                                 mode="bilinear", align_corners=True)

        out = self.bu_dec_l1(l4)
        out = up_to(out, l3) + self.merge_l2(l3)
        out = self.bu_dec_l2(out)
        out = up_to(out, l2) + self.merge_l3(l2)
        out = self.bu_dec_l3(out)
        out = up_to(out, l1) + self.merge_l4(l1)
        out = self.bu_dec_l4(out)
        return F.interpolate(out, size=(x.shape[2], x.shape[3]),
                             mode="bilinear", align_corners=True)


# ---------------------------------------------------------------------------
# flax -> torch weight transplant
# ---------------------------------------------------------------------------

def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _load_conv(conv: nn.Conv2d, leaf):
    # flax HWIO -> torch OIHW
    conv.weight.data = _t(leaf["kernel"]).permute(3, 2, 0, 1).contiguous()
    if conv.bias is not None:
        conv.bias.data = _t(leaf.get("bias", np.zeros(conv.out_channels)))


def _load_bn(bn: nn.BatchNorm2d, p, s):
    bn.weight.data = _t(p["scale"])
    bn.bias.data = _t(p["bias"])
    bn.running_mean.data = _t(s["mean"])
    bn.running_var.data = _t(s["var"])


def _load_prelu(act: nn.PReLU, p):
    act.weight.data = _t(p["alpha"])


def _load_c(mod: TC, p):
    _load_conv(mod.conv, p["Conv_0"])


def _load_cb(mod: TCB, p, s):
    _load_conv(mod.conv, p["C_0"]["Conv_0"])
    _load_bn(mod.bn, p["BatchNorm_0"], s["BatchNorm_0"])


def _load_cbr(mod: TCBR, p, s):
    _load_cb(mod.cb, p["CB_0"], s["CB_0"])
    _load_prelu(mod.act, p["PReLU_0"])


def _load_br(mod: TBR, p, s):
    _load_bn(mod.bn, p["BatchNorm_0"], s["BatchNorm_0"])
    _load_prelu(mod.act, p["PReLU_0"])


def _load_eesp(mod: TEESP, p, s):
    _load_cbr(mod.proj_1x1, p["proj_1x1"], s["proj_1x1"])
    for i, conv in enumerate(mod.branches):
        # flax dw kernel (3,3,1,n) -> torch (n,1,3,3)
        conv.weight.data = _t(p[f"dw_d{i}_kernel"]).permute(
            3, 2, 0, 1).contiguous()
    _load_br(mod.br_after_cat, p["br_after_cat"], s["br_after_cat"])
    _load_cb(mod.conv_1x1_exp, p["conv_1x1_exp"], s["conv_1x1_exp"])
    if "module_act" in p:
        _load_prelu(mod.module_act, p["module_act"])


def _load_down(mod: TDownSampler, p, s):
    _load_eesp(mod.eesp, p["eesp"], s["eesp"])
    if mod.reinf and "inp_reinf_cbr" in p:
        _load_cbr(mod.inp_reinf_cbr, p["inp_reinf_cbr"], s["inp_reinf_cbr"])
        _load_cb(mod.inp_reinf_cb, p["inp_reinf_cb"], s["inp_reinf_cb"])
    _load_prelu(mod.act, p["act"])


def _load_encoder(mod: TEESPNetEncoder, p, s):
    _load_cbr(mod.level1, p["level1"], s["level1"])
    _load_down(mod.level2_0, p["level2_0"], s["level2_0"])
    _load_down(mod.level3_0, p["level3_0"], s["level3_0"])
    for i, blk in enumerate(mod.level3_blocks):
        _load_eesp(blk, p[f"level3_blocks_{i}"], s[f"level3_blocks_{i}"])
    _load_down(mod.level4_0, p["level4_0"], s["level4_0"])
    for i, blk in enumerate(mod.level4_blocks):
        _load_eesp(blk, p[f"level4_blocks_{i}"], s[f"level4_blocks_{i}"])


def _load_pyrpool(mod: TEfficientPyrPool, p, s):
    _load_cbr(mod.proj, p["proj"], s["proj"])
    for i, conv in enumerate(mod.dw):
        conv.weight.data = _t(p[f"dw_s{i}_kernel"]).permute(
            3, 2, 0, 1).contiguous()
    _load_br(mod.merge_br, p["merge_br"], s["merge_br"])
    _load_cbr(mod.merge_cbr, p["merge_cbr"], s["merge_cbr"])
    _load_c(mod.classify, p["classify"])
    if mod.last_layer_br:
        _load_br(mod.last_br, p["last_br"], s["last_br"])


def _load_pwc(mod: TEfficientPWC, p, s):
    _load_c(mod.wt_conv, p["wt_conv"])
    _load_cbr(mod.expand, p["expand"], s["expand"])


def load_from_flax(model: TESPNetv2Segmentation, variables) -> None:
    """Transplant a flax ESPNetv2Segmentation variable tree into `model`."""
    p, s = variables["params"], variables["batch_stats"]
    _load_encoder(model.base_net, p["base_net"], s["base_net"])
    for name in ("bu_dec_l1", "bu_dec_l2", "bu_dec_l3", "bu_dec_l4"):
        _load_pyrpool(getattr(model, name), p[name], s[name])
    for name in ("merge_l2", "merge_l3", "merge_l4"):
        _load_pwc(getattr(model, name), p[name], s[name])
    model.eval()
