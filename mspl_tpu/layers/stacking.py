"""Ensemble weight stacking: run N same-architecture models as ONE forward.

The reference's pseudo-label hot loop is `for m in models: logits_m = m(img)`
(SURVEY.md §3.2) — three sequential ESPNetv2 forwards differing only in
classifier width.  TPU-first, the ensemble folds into a single network whose
every channel dimension carries the N models side by side ("m-major" layout:
channels [model0 | model1 | ... ] within every tensor):

* a dense conv becomes a block-diagonal grouped conv (groups=N) — lowered by
  `ops/grouped_conv.py` to XLA's fast dense path;
* a grouped conv (G groups) becomes an N*G-group conv: in m-major layout the
  stacked groups are exactly the contiguous concatenation of each model's
  groups, so the stacked kernel is just the per-model kernels concatenated
  along the output axis;
* depthwise convs / BN / PReLU / pools / resizes are per-channel and stack by
  parameter concatenation;
* convs consuming the UNSTACKED raw image (the encoder stem and the
  DownSampler reinforcement branches) stay dense with N-times the output
  channels — and the shared input pyramid is computed ONCE for the whole
  ensemble instead of once per model;
* channel-concatenation sites (EESP branch merge, DownSampler pool++eesp)
  must interleave per model to preserve the m-major invariant —
  `stacked_concat` below;
* the per-model channel shuffle becomes `stacked_shuffle`.

Because every extra multiply in the block-diagonal form is an exact zero,
the stacked forward is BIT-EXACT vs the per-model forwards (f32 and bf16) —
asserted in tests/test_stacked.py.

Why it was built: the r3 encoder roofline (docs/ENCODER_ROOFLINE.md) pins
the remaining device-time headroom on lane starvation + issue overhead of
many small ops; stacking triples the channels per op and cuts the op count
3x (VERDICT r3 item 3 — the one untried headline lever).

MEASURED RESULT (v5e, batch 128, 256x480, bf16, 2026-08-20,
tools/exp_stack.py): a RECORDED NEGATIVE for throughput.  All three
lowerings of the stacked ensemble LOSE to the plain sequential loop:

    A  sequential + channel-major + fused tails (headline)   1362.8 img/s
    B  sequential, NHWC, jnp epilogue (stacking baseline)     1022.0
    C  vmap over stacked params (same config as B)              922.8
    D  this module, fully block-diagonal                        719.9
    E  this module, per-model densify + feature_group_count=3   884.4

Why it loses on THIS architecture: at s=2.0 the encoder already runs >=128
channels (lanes full), so stacking adds MXU work without reducing HBM
traffic — D pays 3x the (already factor-G) densification waste of
ops/grouped_conv.py, which stops being free at stack scale; E trades that
for XLA's slower native grouped path; C gets the pathological narrow-group
lowering from the conv batching rule.  The genuinely lane-starved decoder
is already handled by the channel-parallel Pallas pyrpool kernels, whose
work scales linearly in channels — no packing win from 3x the planes.  The
only structural saving (the shared input pyramid, computed once instead of
3x) is two avg-pool chains, ~noise.

The machinery stays: it is exact (tests/test_stacked.py — bit-level modulo
fp32 reassociation, incl. train-mode BN and heterogeneous 11/19/5 heads
padded to 19), and it is the right substrate for ensembles of genuinely
narrow models (s<=0.5 members whose encoders ARE lane-starved) or for
future architectures; it is just not a win for the 3x s=2.0 headline
workload.

Heads of different widths (11/19/5 classes) stack by padding every
classifier to the widest head with zero weights and bias -1e4: the pad
classes get exactly 0.0 softmax mass, and the zero-padded label-space
conversion matrices (data/label_space.py) absorb the mask for free.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def stacked_concat(tensors: Sequence[jnp.ndarray], stack: int,
                   axis: int = -1) -> jnp.ndarray:
    """Channel-concat that preserves the m-major stacked layout.

    Each input's channel axis is [m0_c | m1_c | ...]; a plain concatenate
    would produce [t0_m0 | t0_m1 | ... | t1_m0 | ...].  Viewing each tensor
    as [..., stack, c] and concatenating on the minor axis interleaves per
    model — same bytes written as a plain concat, no extra relayout."""
    if stack == 1:
        return jnp.concatenate(tensors, axis=axis)
    assert axis in (-1, tensors[0].ndim - 1), "m-major concat is channel-only"
    split = [t.reshape(*t.shape[:-1], stack, t.shape[-1] // stack)
             for t in tensors]
    out = jnp.concatenate(split, axis=-1)
    return out.reshape(*out.shape[:-2], out.shape[-2] * out.shape[-1])


def stacked_shuffle(x: jnp.ndarray, groups: int, stack: int) -> jnp.ndarray:
    """Per-model channel shuffle (reference `Shuffle`) on an m-major tensor."""
    b, h, w, c = x.shape
    cm = c // stack
    x = x.reshape(b, h, w, stack, groups, cm // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


def block_diag_dense(kernels: jnp.ndarray, stack: int) -> jnp.ndarray:
    """[kh, kw, cin_m, stack*cout_m] m-major grouped kernel -> block-diagonal
    dense [kh, kw, stack*cin_m, stack*cout_m] (for call sites that need a
    dense kernel explicitly, e.g. the pyrpool eval commute path)."""
    kh, kw, cin_m, cout = kernels.shape
    kg = kernels.reshape(kh, kw, cin_m, stack, cout // stack)
    eye = jnp.eye(stack, dtype=kernels.dtype)
    dense = jnp.einsum("hwimo,mM->hwMimo", kg, eye)
    return dense.reshape(kh, kw, stack * cin_m, cout)


def _concat_leaves(leaves: List[jnp.ndarray]) -> jnp.ndarray:
    a = leaves[0]
    if a.ndim == 0:
        return a
    return jnp.concatenate(leaves, axis=-1)


def _interleave_leaves(leaves: List[jnp.ndarray], blocks: int) -> jnp.ndarray:
    """Per-channel params over a SCALE-MAJOR stacked tensor (pyrpool
    merge_br: the branch kernels concat per scale, so stacked channels run
    [scale, model, p]): reshape each model's [blocks*p] to [blocks, p],
    stack models minor, flatten."""
    p = leaves[0].shape[-1] // blocks
    split = [leaf.reshape(*leaf.shape[:-1], blocks, 1, p) for leaf in leaves]
    out = jnp.concatenate(split, axis=-2)
    return out.reshape(*out.shape[:-3], blocks * len(leaves) * p)


def pad_variables_to_template(variables, template,
                              classify_path_tokens: Sequence[str] = (
                                  "bu_dec_l4", "classify"),
                              merge_br_blocks: int = 5):
    """Zero-pad a model's variable tree to a wider TEMPLATE's leaf shapes so
    heterogeneous ensemble members (different classifier widths => different
    pyrpool proj widths) can stack.

    Exactness: padded output channels are exact zeros everywhere — conv
    kernels pad with zero in/out blocks, BN pads (scale 0, bias 0, mean 0,
    var 0) map any input to 0, PReLU(0)=0 — and the final classifier's pad
    classes get bias -1e4 (exactly 0.0 softmax mass).  The padded model's
    TRUE channels compute bit-identically to the unpadded model.

    Only last-axis (channel/output) pads are supported; `merge_br` leaves
    sit on a scale-major tensor and pad per scale block."""
    import flax

    fv = flax.traverse_util.flatten_dict(variables)
    ft = flax.traverse_util.flatten_dict(template)
    out = {}
    for k, leaf in fv.items():
        tgt = ft[k].shape
        if leaf.shape == tgt:
            out[k] = leaf
            continue
        assert all(t >= s_ for t, s_ in zip(tgt, leaf.shape)), (
            f"{k}: template narrower than source, {leaf.shape} -> {tgt}")
        extra = tgt[-1] - leaf.shape[-1]
        if "merge_br" in k and extra:
            # scale-major channel axis: pad each scale block
            per = leaf.shape[-1] // merge_br_blocks
            blk = leaf.reshape(*leaf.shape[:-1], merge_br_blocks, per)
            blk = jnp.pad(blk, [(0, 0)] * (blk.ndim - 1)
                          + [(0, extra // merge_br_blocks)])
            out[k] = blk.reshape(*leaf.shape[:-1], tgt[-1])
        elif (all(tok in k for tok in classify_path_tokens)
              and k[-1] == "bias"):
            out[k] = jnp.concatenate(
                [leaf, jnp.full((extra,), -1e4, leaf.dtype)])
        else:
            # zero-pad every widened axis: zero in-rows ignore the padded
            # inputs, zero out-rows emit exact-zero padded channels
            out[k] = jnp.pad(leaf, [(0, t - s_) for t, s_
                                    in zip(tgt, leaf.shape)])
    return flax.traverse_util.unflatten_dict(out)


def stack_variables(variables_list, pad_classifier_to: int | None = None,
                    classify_path_tokens: Sequence[str] = ("bu_dec_l4",
                                                           "classify")):
    """Fold N per-model variable trees into ONE stacked-model tree.

    In m-major layout every parameter stacks by concatenation along its
    channel/output axis, which is the LAST axis for every leaf this
    architecture has (conv kernels HWIO concat on O; BN scale/bias/mean/var,
    PReLU alpha, biases concat on their only axis).

    `pad_classifier_to`: pad each model's final classifier conv (the leaf
    whose path contains ALL of `classify_path_tokens`) to this many output
    classes first — zero weights, bias -1e4 (=> exactly 0.0 softmax mass for
    the pad classes; pair with zero-padded conversion matrices)."""
    import flax

    def pad_tree(v):
        if pad_classifier_to is None:
            return v
        flat = flax.traverse_util.flatten_dict(v)
        out = {}
        for k, leaf in flat.items():
            if all(tok in k for tok in classify_path_tokens):
                o = leaf.shape[-1]
                if k[-1] == "kernel" and o < pad_classifier_to:
                    pad = [(0, 0)] * (leaf.ndim - 1) + [
                        (0, pad_classifier_to - o)]
                    leaf = jnp.pad(leaf, pad)
                elif k[-1] == "bias" and o < pad_classifier_to:
                    leaf = jnp.concatenate(
                        [leaf, jnp.full((pad_classifier_to - o,), -1e4,
                                        leaf.dtype)])
            out[k] = leaf
        return flax.traverse_util.unflatten_dict(out)

    padded = [pad_tree(v) for v in variables_list]
    flats = [flax.traverse_util.flatten_dict(v) for v in padded]
    out = {}
    for k in flats[0]:
        leaves = [f[k] for f in flats]
        assert all(x.shape == leaves[0].shape for x in leaves), (
            f"{k}: members disagree on shape "
            f"{[x.shape for x in leaves]} — pad heterogeneous members with "
            "pad_variables_to_template first")
        if "merge_br" in k:
            # pyrpool merge_br sits on a scale-major stacked tensor (5
            # pyramid scales) — see _interleave_leaves
            out[k] = _interleave_leaves(leaves, blocks=5)
        else:
            out[k] = _concat_leaves(leaves)
    return flax.traverse_util.unflatten_dict(out)
