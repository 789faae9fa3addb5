"""Efficient pyramid pooling decoder blocks (reference layer L1, SURVEY.md §2
"Efficient pyramid pool": PSP-style decoder module — projection conv,
multi-scale depthwise branches, merge, classify).

`EfficientPyrPool`: project to a small channel count, run a depthwise 3x3 at
several spatial scales (up/down-sampled copies of the feature map), resize all
branches back, concat, channel-shuffle, grouped 3x3 merge, 1x1 classify.
`EfficientPWC`: pointwise expansion gated by a global-context sigmoid (used to
merge encoder skips into the decoder path).

Scale resampling uses the matmul-based resize/adaptive-pool ops from
`mspl_tpu.ops.resize` so the whole block stays MXU/VPU friendly; bilinear
branches use align_corners=True to match the reference decoder convention
(SURVEY.md §7 "Resize parity").
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspl_tpu.layers.conv_blocks import BR, C, CB, CBR


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Interleave channels across `groups` (reference `Shuffle`)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


class EfficientPyrPool(nn.Module):
    """`use_pallas=None` (auto) routes the 5-branch resample→depthwise→
    resample-back stack through the fused whole-plane Pallas kernel
    (mspl_tpu/ops/pallas_pyrpool.py) on TPU and keeps the jnp path on CPU;
    True/False force it.  Branch weights are owned by this module so the
    two paths share parameters."""

    proj_features: int
    out_features: int
    scales: Tuple[float, ...] = (2.0, 1.5, 1.0, 0.5, 0.1)
    last_layer_br: bool = True
    use_pallas: bool | None = None
    # fuse the post-concat tail (BN/PReLU/shuffle/merge/classify) into the
    # kernel at eval: wins only for narrow heads (the classifier stage);
    # wide inner stages (O>=32) lose to branch-kernel + XLA tail
    fuse_tail: bool = False
    # with fuse_tail: return [B, O, H, W] instead of NHWC (the fused eval
    # kernel computes channel-major anyway; skipping the transpose lets the
    # final logits resize consume it directly).  The contract holds on every
    # path: the train/jnp path transposes to match.
    channel_major_out: bool = False
    # ensemble weight stacking (layers/stacking.py): proj_features /
    # out_features stay PER-MODEL; the block carries `stack` models m-major
    stack: int = 1
    # channel-major TRAIN layout (VERDICT r3 item 4, ops/cm_ops.py): input,
    # `pre`, and output are [B, C, H, W]; every op runs natively in that
    # layout so XLA never batch-minors the lane-starved decoder tensors.
    # Orthogonal to the eval kernel paths (use_pallas/fuse_tail), which
    # this flag bypasses.  Parameter tree identical to the NHWC path.
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        import jax

        from mspl_tpu.ops.resize import resize_bilinear

        s = self.stack
        p = self.proj_features
        scales = tuple(sorted(self.scales, reverse=True))
        if self.cm:
            if s > 1:
                raise NotImplementedError("cm + ensemble stacking")
            return self._cm_forward(x, pre, train, scales)
        # `pre`: a lower-resolution decoder tensor to be bilinearly upsampled
        # to x's size and ADDED to x before this block (the bottom-up decoder
        # skip merge).  Folding the merge in here lets eval commute the 1x1
        # proj conv with the upsample: conv+BN are linear in eval (running
        # stats = per-channel affine), and align_corners bilinear rows sum to
        # 1, so  CBR(up(pre) + x) == PReLU(up(conv(pre)*a) + conv(x)*a + b).
        # The upsample then moves from the decoder width (32-64 ch) to the
        # proj width (8-16 ch) — the device trace priced the last (1/2-res,
        # 32ch) upsample + its layout copy + the 32ch add at ~3.5 ms/model.
        # Train keeps the plain order: train-mode BN normalizes with batch
        # statistics of the merged input, which must not be split.
        commute = (pre is not None and not train
                   and not self.is_initializing())
        if pre is not None and not commute:
            x = x + resize_bilinear(pre, (x.shape[1], x.shape[2]),
                                    align_corners=True, order="wh")
        if commute:
            v = self.variables
            pj = v["params"]["proj"]
            st = v["batch_stats"]["proj"]["CB_0"]["BatchNorm_0"]
            a = pj["CB_0"]["BatchNorm_0"]["scale"] / jnp.sqrt(st["var"] + 1e-5)
            beff = pj["CB_0"]["BatchNorm_0"]["bias"] - st["mean"] * a
            ka = (pj["CB_0"]["C_0"]["Conv_0"]["kernel"][0, 0] * a[None, :])
            alpha = pj["PReLU_0"]["alpha"]

            def pconv(t):
                # same 1x1-conv primitive (and therefore lowering/fusion
                # behavior) as the plain path's nn.Conv; bf16 inputs keep a
                # bf16 output — the MXU accumulates in f32 internally, and a
                # preferred_element_type=f32 output would add a separate
                # full-res convert pass (measured 1.45 ms/iter)
                if s > 1:
                    # stacked proj is a block-diagonal grouped 1x1; the
                    # grouped_conv2d densify path keeps the same dense-conv
                    # lowering as below
                    from mspl_tpu.ops.grouped_conv import grouped_conv2d

                    return grouped_conv2d(
                        t, ka.astype(t.dtype)[None, None], groups=s,
                        padding=(0, 0))
                return jax.lax.conv_general_dilated(
                    t, ka.astype(t.dtype)[None, None],
                    window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            za = resize_bilinear(pconv(pre), (x.shape[1], x.shape[2]),
                                 align_corners=True, order="wh")
            z = pconv(x) + za + beff.astype(x.dtype)
            x = jnp.maximum(z, 0) + alpha.astype(z.dtype) * jnp.minimum(z, 0)
        else:
            x = CBR(p * s, kernel_size=1, stride=1, groups=s,
                    name="proj")(x, train=train)
        h, w = x.shape[1], x.shape[2]

        dw_kernels = [
            self.param(f"dw_s{i}_kernel", nn.initializers.he_normal(),
                       (3, 3, 1, p * s), jnp.float32)
            for i in range(len(scales))
        ]
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() != "cpu"

        if (use_pallas and self.fuse_tail and not train and s == 1
                and not self.is_initializing()):
            # Whole-block fused eval kernel: BN here is a per-channel affine
            # (running stats), so the post-concat BN+PReLU, channel shuffle,
            # grouped merge, classifier and last BR all fold into the same
            # per-plane pass as the branch stack.
            from mspl_tpu.ops.pallas_pyrpool import pyr_pool_fused_eval_v3

            v = self.variables

            def bn_affine(tree_p, tree_s):
                a = tree_p["scale"] / jnp.sqrt(tree_s["var"] + 1e-5)
                return a, tree_p["bias"] - tree_s["mean"] * a

            pvars, svars = v["params"], v["batch_stats"]
            a1, b1 = bn_affine(pvars["merge_br"]["BatchNorm_0"],
                               svars["merge_br"]["BatchNorm_0"])
            aff1 = jnp.stack([a1, b1, pvars["merge_br"]["PReLU_0"]["alpha"]])
            a2, b2 = bn_affine(pvars["merge_cbr"]["CB_0"]["BatchNorm_0"],
                               svars["merge_cbr"]["CB_0"]["BatchNorm_0"])
            aff2 = jnp.stack([a2, b2, pvars["merge_cbr"]["PReLU_0"]["alpha"]])
            merge_w = pvars["merge_cbr"]["CB_0"]["C_0"]["Conv_0"]["kernel"]
            cls_w = pvars["classify"]["Conv_0"]["kernel"][0, 0]
            o = cls_w.shape[1]
            cls_b = pvars["classify"]["Conv_0"].get(
                "bias", jnp.zeros((o,), jnp.float32))
            if self.last_layer_br:
                a3, b3 = bn_affine(pvars["last_br"]["BatchNorm_0"],
                                   svars["last_br"]["BatchNorm_0"])
                aff3 = jnp.stack(
                    [a3, b3, pvars["last_br"]["PReLU_0"]["alpha"]])
            else:
                aff3 = jnp.stack([jnp.ones((o,)), jnp.zeros((o,)),
                                  jnp.ones((o,))])
            wstack = jnp.stack([k[:, :, 0, :] for k in dw_kernels])
            return pyr_pool_fused_eval_v3(
                x, wstack.astype(jnp.float32), aff1.astype(jnp.float32),
                merge_w.astype(jnp.float32), aff2.astype(jnp.float32),
                cls_w.astype(jnp.float32), cls_b.astype(jnp.float32),
                aff3.astype(jnp.float32), scales,
                channel_major_out=self.channel_major_out)

        wstack = jnp.stack([k[:, :, 0, :] for k in dw_kernels])
        if use_pallas:
            # differentiable: the kernel carries a custom VJP (backward runs
            # the jnp reference's VJP), so the train step may use it too
            from mspl_tpu.ops.pallas_pyrpool import pyr_branches_pallas

            out = pyr_branches_pallas(x, wstack.astype(x.dtype), scales)
        else:
            from mspl_tpu.ops.pallas_pyrpool import pyr_branches_jnp

            out = pyr_branches_jnp(x, wstack, scales)
        out = BR(out.shape[-1], name="merge_br")(out, train=train)
        if s > 1:
            # the branch stack concatenates per SCALE, so the stacked tensor
            # here is scale-major [scale, model, p] (and merge_br's params
            # are interleaved to match — layers/stacking.py merge_br rule).
            # The per-model channel shuffle [scale, p] -> [p, scale] lands
            # m-major directly: one transposed write, exactly what the
            # unstacked channel_shuffle costs.
            b_, h_, w_, c_ = out.shape
            out = out.reshape(b_, h_, w_, len(scales), s, p)
            out = jnp.transpose(out, (0, 1, 2, 4, 5, 3))
            out = out.reshape(b_, h_, w_, c_)
        else:
            out = channel_shuffle(out, groups=len(scales))
        out = CBR(p * s, kernel_size=3, stride=1, groups=p * s,
                  name="merge_cbr")(out, train=train)
        out = C(
            self.out_features * s, kernel_size=1, stride=1, groups=s,
            use_bias=not self.last_layer_br, name="classify",
        )(out)
        if self.last_layer_br:
            out = BR(self.out_features * s, name="last_br")(out, train=train)
        if self.channel_major_out:
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out

    def _cm_forward(self, x, pre, train, scales):
        """Channel-major train forward: same math and parameter tree as the
        jnp NHWC path, every op on [B, C, H, W] (ops/cm_ops.py).  Exactness
        vs the NHWC path: tests/test_cm_decoder.py."""
        from mspl_tpu.ops.cm_ops import channel_shuffle_cm, pyr_branches_cm
        from mspl_tpu.ops.resize import resize_bilinear_cm

        p = self.proj_features
        if pre is not None:
            x = x + resize_bilinear_cm(pre, (x.shape[2], x.shape[3]),
                                       align_corners=True)
        x = CBR(p, kernel_size=1, stride=1, name="proj", cm=True)(
            x, train=train)
        dw_kernels = [
            self.param(f"dw_s{i}_kernel", nn.initializers.he_normal(),
                       (3, 3, 1, p), jnp.float32)
            for i in range(len(scales))
        ]
        wstack = jnp.stack([k[:, :, 0, :] for k in dw_kernels])
        out = pyr_branches_cm(x, wstack, scales)
        out = BR(out.shape[1], name="merge_br", cm=True)(out, train=train)
        out = channel_shuffle_cm(out, groups=len(scales))
        out = CBR(p, kernel_size=3, stride=1, groups=p, name="merge_cbr",
                  cm=True)(out, train=train)
        out = C(self.out_features, kernel_size=1, stride=1,
                use_bias=not self.last_layer_br, name="classify",
                cm=True)(out)
        if self.last_layer_br:
            out = BR(self.out_features, name="last_br", cm=True)(
                out, train=train)
        return out


class EfficientPWC(nn.Module):
    """Efficient pointwise expansion with a global-context sigmoid gate.

    ``cm=True``: channel-major [B, C, H, W] train layout (see
    EfficientPyrPool.cm); parameter tree identical."""

    out_features: int
    stack: int = 1  # ensemble weight stacking; out_features is PER-MODEL
    cm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = self.stack
        if self.cm:
            if s > 1:
                raise NotImplementedError("cm + ensemble stacking")
            nin, nout = x.shape[1], self.out_features
            gate = jnp.mean(x, axis=(2, 3), keepdims=True)
            gate = C(nout, kernel_size=1, stride=1, name="wt_conv",
                     cm=True)(gate)
            gate = nn.sigmoid(gate)
            out = CBR(nout, kernel_size=3, stride=1,
                      groups=math.gcd(nin, nout), name="expand",
                      cm=True)(x, train=train)
            return out * gate
        nin, nout = x.shape[-1] // s, self.out_features
        gate = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg pool
        gate = C(nout * s, kernel_size=1, stride=1, groups=s,
                 name="wt_conv")(gate)
        gate = nn.sigmoid(gate)
        groups = math.gcd(nin, nout)
        out = CBR(nout * s, kernel_size=3, stride=1, groups=groups * s,
                  name="expand")(x, train=train)
        return out * gate
