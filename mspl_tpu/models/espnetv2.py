"""ESPNetv2 classification backbone and segmentation model (reference layer
L2, SURVEY.md §2 "ESPNetv2 classification backbone" / "ESPNetv2 segmentation
model"; architecture per SURVEY.md Appendix A and the ESPNetv2 paper
arXiv:1811.11431).

Backbone (`EESPNet`): init 3x3/s2 conv → 4 downsampling stages (DownSampler +
EESP repeats ≈ [0,3,7,3]) with RGB input reinforcement on the first three
downsamplers, width controlled by scaler `s`; classification head = depthwise
+ grouped-pointwise expansion → GAP → dropout → linear (used only for
ImageNet-style pretraining of the encoder).

Segmentation (`ESPNetv2Segmentation`): encoder taps at 1/2, 1/4, 1/8, 1/16 →
bottom-up decoder: EfficientPyrPool at 1/16 → (bilinear x2, EfficientPWC skip
merge, EfficientPyrPool) at 1/8 and 1/4 → merge with the 1/2 features → final
EfficientPyrPool to `num_classes` logits → bilinear x2 to input resolution.
All upsampling is align_corners=True bilinear (SURVEY.md §7 "Resize parity").

TPU-first design notes: NHWC layout; all ops static-shaped and jit-friendly;
`compute_dtype=bfloat16` runs the conv stack in bf16 while keeping params and
BN statistics in fp32 (bf16 inputs are cast at entry; logits are returned in
the compute dtype — consumers upcast to fp32 where it matters).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspl_tpu.layers.conv_blocks import CBR
from mspl_tpu.layers.eesp import EESP, DownSampler
from mspl_tpu.layers.pyramid_pool import EfficientPWC, EfficientPyrPool
from mspl_tpu.ops.resize import resize_bilinear


def eespnet_channel_plan(s: float) -> Tuple[int, ...]:
    """Stage channel plan for width scaler `s` (SURVEY.md §2: e.g. s=2.0 →
    32,128,256,512,1024 encoder + 1280 classifier expansion)."""
    k = 4
    base = 32
    base_s = int(math.ceil(int(base * s) / k) * k)
    c0 = base if base_s > base else base_s
    plan = [c0] + [base_s * (2 ** i) for i in range(1, 5)]
    plan.append(1024 if s <= 1.5 else 1280)
    return tuple(plan)


# per-stage branch counts and receptive-field limits (SURVEY.md App. A; the
# dilation schedule shrinks with depth as feature maps get smaller)
_STAGE_K = (4, 4, 4, 4, 4)
_STAGE_RLIM = (13, 11, 9, 7, 5)
_STAGE_REPS = (0, 3, 7, 3)


class EESPNet(nn.Module):
    """ESPNetv2 classification backbone / segmentation encoder.

    `encode(x)` returns the stride-2/4/8/16 taps for segmentation decoders;
    `__call__(x)` runs the full classification head.  Submodules are defined
    in `setup` so both entry points share the encoder parameters; head
    modules left uncalled (e.g. level5 under a seg decoder) allocate nothing.
    """

    s: float = 2.0
    num_classes: int = 1000
    reinf: bool = True
    drop_rate: float = 0.2
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    # EXPERIMENTAL (measured slower, default off): fuse each stride-1 EESP
    # stage into chained whole-stage Pallas kernels at eval
    # (ops/pallas_eesp_stage.py).  r2 kernel (grouped expand dots, folded
    # BN scales, lane-packed narrow stages) measured on v5e (batch 128,
    # bf16, 256x480): isolated stage3 6.6 ms vs 5.8 lax, stage4 5.6 vs
    # 5.3 (r1 kernel: 9.9/8.1); whole pipeline 1304.7 vs 1441.1 img/s —
    # XLA keeps winning in-context (the kernel's entry/exit relayouts and
    # serialized VPU tap work outweigh its HBM-traffic savings at these
    # shapes).  None = off.
    fuse_stages: bool | None = None
    # Layout-contract experiment (docs/ENCODER_ROOFLINE.md "what would
    # change that" (b); only meaningful with fuse_stages): carry the
    # zero-padded [B, H, Wp, C] form from before stage3 through stage4 at
    # eval, so the fused stage kernels skip their per-call entry-pad /
    # exit-slice relayouts and the level4 DownSampler consumes the padded
    # tensor directly (its EESP masks the proj output pad columns to keep
    # the conv halo exact — layers/eesp.py `valid_w`).
    layout_contract: bool = False
    # Ensemble weight stacking (layers/stacking.py): run `stack` models of
    # this architecture as ONE forward, channels m-major.  The raw-image
    # stem/reinforcement convs widen (shared input), everything else goes
    # block-diagonal; the shared input pyramid is computed once for all.
    stack: int = 1

    def setup(self):
        cfg = eespnet_channel_plan(self.s)
        if self.stack > 1 and self.fuse_stages:
            raise ValueError("fuse_stages (experimental) does not support "
                             "ensemble stacking")
        self.level1 = CBR(cfg[0] * self.stack, kernel_size=3, stride=2)
        self.level2_0 = DownSampler(cfg[1], k=_STAGE_K[0], r_lim=_STAGE_RLIM[0],
                                    reinf=self.reinf, use_pallas=self.use_pallas,
                                    stack=self.stack)
        self.level3_0 = DownSampler(cfg[2], k=_STAGE_K[1], r_lim=_STAGE_RLIM[1],
                                    reinf=self.reinf, use_pallas=self.use_pallas,
                                    stack=self.stack)
        self.level3_blocks = [
            EESP(cfg[2], k=_STAGE_K[2], r_lim=_STAGE_RLIM[2],
                 use_pallas=self.use_pallas, stack=self.stack)
            for _ in range(_STAGE_REPS[1])
        ]
        self.level4_0 = DownSampler(cfg[3], k=_STAGE_K[2], r_lim=_STAGE_RLIM[2],
                                    reinf=self.reinf, use_pallas=self.use_pallas,
                                    stack=self.stack)
        self.level4_blocks = [
            EESP(cfg[3], k=_STAGE_K[3], r_lim=_STAGE_RLIM[3],
                 use_pallas=self.use_pallas, stack=self.stack)
            for _ in range(_STAGE_REPS[2])
        ]
        # classification-only tail (stack>1 guarded in __call__ — the GAP
        # head is pretraining-only and never runs stacked)
        self.level5_0 = DownSampler(cfg[4], k=_STAGE_K[3], r_lim=_STAGE_RLIM[3],
                                    reinf=False)
        self.level5_blocks = [
            EESP(cfg[4], k=_STAGE_K[4], r_lim=_STAGE_RLIM[4],
                 use_pallas=self.use_pallas)
            for _ in range(_STAGE_REPS[3])
        ]
        self.level5_dw = CBR(cfg[4], kernel_size=3, stride=1, groups=cfg[4])
        self.level5_exp = CBR(cfg[5], kernel_size=1, stride=1, groups=_STAGE_K[4])
        self.dropout = nn.Dropout(rate=self.drop_rate)
        self.classifier = nn.Dense(self.num_classes)

    def _run_stage(self, x, blocks, prefix, k, r_lim, train,
                   padded_io=False, true_w=None):
        """Run a stride-1 EESP repeat stage: experimental fused whole-stage
        kernel when `fuse_stages` is set, per-unit lax path otherwise (both
        share the param tree)."""
        fuse = bool(self.fuse_stages)
        if blocks and fuse and not train and not self.is_initializing():
            from mspl_tpu.layers.eesp import branch_dilations
            from mspl_tpu.ops.pallas_eesp_stage import (
                eesp_block_params,
                eesp_stage_fused_eval,
            )

            v = self.variables
            params = [
                eesp_block_params(v["params"][f"{prefix}_{i}"],
                                  v["batch_stats"][f"{prefix}_{i}"], k)
                for i in range(len(blocks))
            ]
            return eesp_stage_fused_eval(x, params,
                                         branch_dilations(k, r_lim),
                                         padded_io=padded_io, true_w=true_w)
        if padded_io:
            raise ValueError("layout contract requires the fused stage path")
        for blk in blocks:
            x = blk(x, train=train)
        return x

    def encode(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Encoder taps at strides 2, 4, 8, 16."""
        from mspl_tpu.layers.eesp import _avg_pool_3x3_s2

        img = x.astype(self.compute_dtype)
        l1 = self.level1(img, train=train)
        # shared input pyramid: each DownSampler's reinforcement branch
        # needs the raw image at ITS output resolution; pooling once here
        # (instead of from full res inside every DownSampler) drops 5 of 9
        # large avg-pools per forward with numerics unchanged — the
        # DownSampler's own pooling loop no-ops on a size-matched input
        img4 = _avg_pool_3x3_s2(_avg_pool_3x3_s2(img)) if self.reinf else img
        img8 = _avg_pool_3x3_s2(img4) if self.reinf else img
        img16 = _avg_pool_3x3_s2(img8) if self.reinf else img
        l2 = self.level2_0(l1, img4, train=train)
        l3 = self.level3_0(l2, img8, train=train)

        w3 = l3.shape[2]
        wp3 = -(-w3 // 8) * 8
        contract = (bool(self.fuse_stages) and self.layout_contract
                    and not train and not self.is_initializing()
                    and self.level3_blocks and self.level4_blocks
                    and (wp3 // 2) % 8 == 0)
        if not contract:
            l3 = self._run_stage(l3, self.level3_blocks, "level3_blocks",
                                 _STAGE_K[2], _STAGE_RLIM[2], train)
            l4 = self.level4_0(l3, img16, train=train)
            l4 = self._run_stage(l4, self.level4_blocks, "level4_blocks",
                                 _STAGE_K[3], _STAGE_RLIM[3], train)
            return l1, l2, l3, l4

        # padded layout contract (see `layout_contract`): ONE zero-pad here,
        # then [B, H, Wp, C] flows through stage3 -> level4_0 -> stage4 with
        # no per-kernel pad/slice; true-width views are sliced only for the
        # decoder taps.  Exactness: stage kernels emit zero pad columns, and
        # level4_0's EESP re-zeros its proj output pads (valid_w), so every
        # conv halo matches the unpadded SAME-padding math bit-for-bit.
        l3p = (l3 if wp3 == w3 else
               jnp.pad(l3, ((0, 0), (0, 0), (0, wp3 - w3), (0, 0))))
        l3p = self._run_stage(l3p, self.level3_blocks, "level3_blocks",
                              _STAGE_K[2], _STAGE_RLIM[2], train,
                              padded_io=True, true_w=w3)
        w4 = (w3 + 1) // 2
        wp4 = wp3 // 2
        img16p = img16
        if self.reinf and img16.shape[2] != wp4:
            img16p = jnp.pad(
                img16, ((0, 0), (0, 0), (0, wp4 - img16.shape[2]), (0, 0)))
        l4p = self.level4_0(l3p, img16p, train=train, valid_w=w3)
        l4p = self._run_stage(l4p, self.level4_blocks, "level4_blocks",
                              _STAGE_K[3], _STAGE_RLIM[3], train,
                              padded_io=True, true_w=w4)
        return l1, l2, l3p[:, :, :w3, :], l4p[:, :, :w4, :]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Classification forward (ImageNet-style pretraining head)."""
        if self.stack > 1:
            raise ValueError("the classification head does not support "
                             "ensemble stacking (pretraining-only path)")
        _, _, _, l4 = self.encode(x, train=train)
        l5 = self.level5_0(l4, None, train=train)
        for blk in self.level5_blocks:
            l5 = blk(l5, train=train)
        l5 = self.level5_dw(l5, train=train)
        l5 = self.level5_exp(l5, train=train)
        pooled = jnp.mean(l5, axis=(1, 2))
        pooled = self.dropout(pooled, deterministic=not train)
        return self.classifier(pooled).astype(jnp.float32)


class ESPNetv2Segmentation(nn.Module):
    """ESPNetv2 semantic segmentation model (encoder + bottom-up decoder)."""

    num_classes: int
    s: float = 2.0
    dec_base_planes: int = 16
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    fuse_stages: bool | None = None  # see EESPNet.fuse_stages
    layout_contract: bool = False  # see EESPNet.layout_contract
    # emit logits as channel-major [B, C, H, W]: the final resize einsum
    # absorbs the layout change for free, and the fused pseudo-label kernel
    # (ops/pallas_pseudo_cm.py) wants W as the lane dim
    channel_major_logits: bool = False
    # ensemble weight stacking (layers/stacking.py): run `stack` models of
    # this architecture as ONE forward; logits carry stack*num_classes
    # channels m-major.  Heads of different true widths are padded to
    # num_classes at weight-stacking time (stack_variables).
    stack: int = 1
    # skip the final x2 bilinear resize and return logits at DECODER
    # resolution (H/2, W/2).  The decoder-res fusion mode (r5,
    # pseudo/generate.py fuse_at='decoder') softmaxes/converts/fuses at
    # this resolution and upsamples only the fused (T+1)-channel
    # distribution — an opt-in approximation with a measured per-pixel
    # agreement gate; the default pipeline keeps the reference's
    # logits-at-input-res semantics exactly.
    final_resize: bool = True
    # channel-major TRAIN decoder (VERDICT r3 item 4, ops/cm_ops.py): during
    # training the decoder runs entirely on [B, C, H, W] — encoder taps are
    # transposed ONCE instead of XLA batch-minoring every lane-starved
    # decoder conv's operands (~15 flip copies/step in the r3 trace).  Eval
    # keeps the NHWC + Pallas kernel pipeline.  Parameter tree identical,
    # so checkpoints are interchangeable; math parity:
    # tests/test_cm_decoder.py.  Whole-step A/B: BASELINE.md backward
    # roofline (r4).
    cm_decoder: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        enc = EESPNet(s=self.s, reinf=True, compute_dtype=self.compute_dtype,
                      use_pallas=self.use_pallas,
                      fuse_stages=self.fuse_stages,
                      layout_contract=self.layout_contract, stack=self.stack,
                      name="base_net")
        l1, l2, l3, l4 = enc.encode(x, train=train)
        if self.cm_decoder and train and self.stack == 1:
            return self._cm_decode(x, l1, l2, l3, l4, train)

        bp = self.dec_base_planes
        dec_planes = (4 * bp, 3 * bp, 2 * bp, self.num_classes)
        # projection width of the pyramid-pool branches; floor of 8 keeps the
        # depthwise pyramid wide enough for tiny target label spaces
        proj = min(bp, max(self.num_classes // 2, 8))

        # The bottom-up upsample+skip-add now lives INSIDE EfficientPyrPool
        # (`pre=`): eval commutes the proj 1x1 conv with the upsample so the
        # resize runs at proj width (8-16 ch) instead of decoder width
        # (32-64 ch); train keeps the reference order exactly.  Size targets
        # come from the skip tensor, handling odd sizes where a pure x2
        # upsample would be off by one (e.g. 45 -> 23 -> 45).
        out = EfficientPyrPool(proj, dec_planes[0], stack=self.stack,
                               name="bu_dec_l1")(l4, train=train)

        m2 = EfficientPWC(dec_planes[0], stack=self.stack,
                          name="merge_l2")(l3, train=train)
        out = EfficientPyrPool(proj, dec_planes[1], stack=self.stack,
                               name="bu_dec_l2")(m2, pre=out, train=train)

        m3 = EfficientPWC(dec_planes[1], stack=self.stack,
                          name="merge_l3")(l2, train=train)
        out = EfficientPyrPool(proj, dec_planes[2], stack=self.stack,
                               name="bu_dec_l3")(m3, pre=out, train=train)

        m4 = EfficientPWC(dec_planes[2], stack=self.stack,
                          name="merge_l4")(l1, train=train)
        # logits stay in compute dtype (bf16 under compute_dtype=bfloat16 —
        # halves the traffic of this full-resolution resize and of the
        # downstream softmax); every consumer (losses, pseudo fusion,
        # metrics) upcasts to fp32 itself.
        if self.channel_major_logits:
            # classifier stage fuses its whole tail into the Pallas kernel
            # at eval and emits [B, C, h, w]; the final resize stays
            # channel-major all the way to the fused pseudo-label pass
            # (Pallas x2 kernel on TPU, einsum fallback elsewhere)
            from mspl_tpu.ops.pallas_resize import resize_x2_cm_pallas

            out = EfficientPyrPool(
                proj, dec_planes[3], last_layer_br=False, fuse_tail=True,
                channel_major_out=True, stack=self.stack, name="bu_dec_l4",
            )(m4, pre=out, train=train)
            if not self.final_resize:
                return out
            return resize_x2_cm_pallas(out, (x.shape[1], x.shape[2]),
                                       align_corners=True)
        out = EfficientPyrPool(
            proj, dec_planes[3], last_layer_br=False, stack=self.stack,
            name="bu_dec_l4"
        )(m4, pre=out, train=train)
        if not self.final_resize:
            return out
        return resize_bilinear(out, (x.shape[1], x.shape[2]),
                               align_corners=True)

    def _cm_decode(self, x, l1, l2, l3, l4, train):
        """Channel-major train decoder: one transpose per encoder tap, then
        the whole bottom-up decoder on [B, C, H, W] (layers/pyramid_pool.py
        cm=True paths).  Logits return in the module's declared layout
        (channel-major when `channel_major_logits`, else NHWC) — exactness
        vs the NHWC decoder: tests/test_cm_decoder.py."""
        from mspl_tpu.ops.resize import resize_bilinear_cm

        bp = self.dec_base_planes
        dec_planes = (4 * bp, 3 * bp, 2 * bp, self.num_classes)
        proj = min(bp, max(self.num_classes // 2, 8))
        t = lambda v: jnp.transpose(v, (0, 3, 1, 2))  # noqa: E731

        out = EfficientPyrPool(proj, dec_planes[0], cm=True,
                               name="bu_dec_l1")(t(l4), train=train)
        m2 = EfficientPWC(dec_planes[0], cm=True,
                          name="merge_l2")(t(l3), train=train)
        out = EfficientPyrPool(proj, dec_planes[1], cm=True,
                               name="bu_dec_l2")(m2, pre=out, train=train)
        m3 = EfficientPWC(dec_planes[1], cm=True,
                          name="merge_l3")(t(l2), train=train)
        out = EfficientPyrPool(proj, dec_planes[2], cm=True,
                               name="bu_dec_l3")(m3, pre=out, train=train)
        m4 = EfficientPWC(dec_planes[2], cm=True,
                          name="merge_l4")(t(l1), train=train)
        out = EfficientPyrPool(proj, dec_planes[3], last_layer_br=False,
                               cm=True, name="bu_dec_l4")(m4, pre=out,
                                                          train=train)
        out = resize_bilinear_cm(out, (x.shape[1], x.shape[2]),
                                 align_corners=True)
        if self.channel_major_logits:
            return out
        return jnp.transpose(out, (0, 2, 3, 1))
