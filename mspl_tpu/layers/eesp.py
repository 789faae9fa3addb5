"""EESP unit and strided DownSampler (reference layer L1, SURVEY.md §2).

Algorithm per SURVEY.md Appendix A ("EESP unit", ESPNetv2 paper
arXiv:1811.11431 §3):

    input (Cin) → grouped 1x1 CBR reduce to n = Cout/K channels
    → K parallel depthwise 3x3 convs with growing dilation rates
    → hierarchical feature fusion (HFF): out_k += out_{k-1}
    → concat (Cout) → BN+PReLU → grouped 1x1 CB expand (Cout)
    → residual add with input when shapes match → PReLU.

Branch dilation rates follow the effective-receptive-field rule: equivalent
kernel sizes 3,5,7,…(3+2i) capped at `r_lim` (over-limit branches fall back to
3), sorted ascending, dilation = (ksize-1)/2.

The strided variant (stride=2, `down_method='avg'`) skips the residual add.
`DownSampler` concatenates the strided EESP with a 3x3/s2 average pool of its
input and optionally adds an input-reinforcement branch computed from the raw
RGB image (avg-pooled to the target resolution → CBR 3x3 → CB 1x1).

TPU notes: the K dilated depthwise branches all read the same projected
activation; the jnp path below uses `lax.conv_general_dilated` per branch
(NHWC, depthwise) and XLA fuses the HFF adds.  A fused Pallas kernel for the
whole branch stack lives in `mspl_tpu.ops.pallas_eesp` and is switched in by
the model flag `use_pallas` (see mspl_tpu/models/espnetv2.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspl_tpu.layers.conv_blocks import BR, CB, CBR, CDilated, PReLU


def branch_dilations(k: int, r_lim: int) -> Tuple[int, ...]:
    """Effective-kernel-size → dilation schedule for the K branches."""
    ksizes = []
    for i in range(k):
        ksize = 3 + 2 * i
        ksizes.append(ksize if ksize <= r_lim else 3)
    ksizes.sort()
    return tuple((ks - 1) // 2 for ks in ksizes)


class EESP(nn.Module):
    """Extremely Efficient Spatial Pyramid unit.

    `use_pallas=True` routes the stride-1 K-branch dilated-depthwise stack +
    HFF through the fused Pallas kernel (mspl_tpu/ops/pallas_eesp.py); the
    parameter tree is identical for both paths (branch weights are owned by
    this module), so checkpoints are interchangeable.
    """

    out_features: int
    stride: int = 1
    k: int = 4
    r_lim: int = 7
    down_method: str = "esp"  # 'avg' => strided variant inside DownSampler
    use_pallas: bool = False
    # ensemble weight stacking (layers/stacking.py): out_features stays the
    # PER-MODEL width; the unit carries `stack` models side by side in
    # m-major channel layout, with every conv's groups multiplied by stack
    stack: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 with_pool: bool = False, valid_w: Optional[int] = None):
        import jax

        from mspl_tpu.layers.stacking import stacked_concat

        s = self.stack
        nin = x.shape[-1] // s  # per-model input width
        nout = self.out_features
        n = nout // self.k
        if n * self.k != nout:
            raise ValueError(f"EESP out_features={nout} must be divisible by k={self.k}")
        groups = self.k if (nin % self.k == 0 and n % self.k == 0) else 1

        proj = CBR(n * s, kernel_size=1, stride=1, groups=groups * s,
                   name="proj_1x1")(x, train=train)
        if valid_w is not None and valid_w < x.shape[2]:
            # padded-layout contract (docs/ENCODER_ROOFLINE.md): columns
            # >= valid_w are width padding.  The proj BN bias makes them
            # nonzero; re-zero so the dilated branches below see an exact
            # zero halo (identical to SAME-padding of the unpadded input).
            mask = (jnp.arange(x.shape[2]) < valid_w)[None, None, :, None]
            proj = proj * mask.astype(proj.dtype)

        dilations = branch_dilations(self.k, self.r_lim)
        # branch weights owned here (shared between lax and Pallas paths)
        dw_kernels = [
            self.param(
                f"dw_d{i}_kernel", nn.initializers.he_normal(),
                (3, 3, 1, n * s), jnp.float32,
            )
            for i in range(self.k)
        ]

        pool_out = None
        # The fused DownSampler-front kernel (mspl_tpu/ops/pallas_downsampler)
        # stays DISABLED: whole-image blocks exceed the 16 MB VMEM scope by
        # 2.7 MB, and both a per-channel grid (269 img/s) and a channel-chunk
        # grid (252 img/s) run ~4x slower than this lax path (1031 img/s) —
        # the dilated windowed reads at offsets up to 2*dmax force per-tap
        # vector realignments in Mosaic.  Kept (with parity + grad tests) as
        # the starting point for an aligned-halo redesign.
        fused_front = False
        if fused_front and with_pool and self.stride == 2:
            from mspl_tpu.ops.pallas_downsampler import down_front_pallas

            wstack = jnp.stack([k_[:, :, 0, :] for k_ in dw_kernels])
            pool_out, merged = down_front_pallas(
                x, proj, wstack.astype(jnp.float32), dilations)
        elif self.use_pallas and self.stride == 1:
            from mspl_tpu.ops.pallas_eesp import eesp_branches_pallas

            w = jnp.stack([k_[..., 0, :] for k_ in dw_kernels]).astype(proj.dtype)
            merged = eesp_branches_pallas(proj, w, dilations)
        else:
            from mspl_tpu.ops.grouped_conv import depthwise_conv3x3

            branches = []
            for i, d in enumerate(dilations):
                b = depthwise_conv3x3(
                    proj, dw_kernels[i].astype(proj.dtype),
                    stride=self.stride, dilation=d,
                )
                # hierarchical feature fusion: cumulative adds kill gridding
                if i > 0:
                    b = b + branches[-1]
                branches.append(b)
            merged = stacked_concat(branches, s)
        merged = BR(nout * s, name="br_after_cat")(merged, train=train)
        expanded = CB(nout * s, kernel_size=1, stride=1, groups=groups * s,
                      name="conv_1x1_exp")(merged, train=train)

        if self.stride == 2 and self.down_method == "avg":
            if with_pool:
                if pool_out is None:  # CPU / non-fused fallback
                    pool_out = _avg_pool_3x3_s2(x)
                return pool_out, expanded
            return expanded
        if expanded.shape == x.shape:
            expanded = expanded + x
        return PReLU(nout * s, name="module_act")(expanded)


def _avg_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    # torch AvgPool2d(3, stride=2, padding=1, count_include_pad=True)
    return nn.avg_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
        count_include_pad=True,
    )


class DownSampler(nn.Module):
    """Strided EESP ++ avg-pool shortcut ++ optional RGB input reinforcement."""

    out_features: int
    k: int = 4
    r_lim: int = 9
    reinf: bool = True
    use_pallas: bool = False
    stack: int = 1  # ensemble weight stacking; out_features is PER-MODEL

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        img: Optional[jnp.ndarray] = None,
        train: bool = False,
        valid_w: Optional[int] = None,
    ) -> jnp.ndarray:
        from mspl_tpu.layers.stacking import stacked_concat

        s = self.stack
        nin = x.shape[-1] // s  # per-model input width
        nout = self.out_features
        nout_new = nout - nin
        if nout_new <= 0:
            raise ValueError(f"DownSampler needs out_features({nout}) > in({nin})")

        avg_out, eesp_out = EESP(
            nout_new, stride=2, k=self.k, r_lim=self.r_lim, down_method="avg",
            use_pallas=self.use_pallas, stack=s, name="eesp",
        )(x, train=train, with_pool=True, valid_w=valid_w)
        out = stacked_concat([avg_out, eesp_out], s)

        if self.reinf and img is not None:
            # avg-pool the raw image until it matches our spatial size
            # (shapes are static under jit, so this loop unrolls at trace time)
            while img.shape[1] != out.shape[1] or img.shape[2] != out.shape[2]:
                img = _avg_pool_3x3_s2(img)
            # the raw image is SHARED by all stacked models: a dense conv
            # with s-times the outputs (m-major), not a block-diagonal one
            r = CBR(img.shape[-1] * s, kernel_size=3, stride=1,
                    name="inp_reinf_cbr")(img, train=train)
            r = CB(nout * s, kernel_size=1, stride=1, groups=s,
                   name="inp_reinf_cb")(r, train=train)
            out = out + r

        return PReLU(nout * s, name="act")(out)
