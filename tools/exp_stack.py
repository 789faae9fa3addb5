"""Ensemble-level restructuring experiment (VERDICT r3 item 3): the three
source models share one architecture (s=2.0 ESPNetv2) and differ only in
classifier width (CamVid 11 / Cityscapes 19 / Forest 5) — so stack their
weights along a leading model axis and run ONE vmapped forward instead of
the reference's `for m in models` serialization (SURVEY.md §3.2 hot loop).

Every lane-starved op then carries 3x the channels per op: XLA's batching
rule folds the model axis of a conv's weights into feature groups /
output channels, which is exactly the starvation the encoder roofline
blames (docs/ENCODER_ROOFLINE.md - 8-40ch decoder ops at 25-31% lane
utilization).

Classifier padding: all three heads padded to 19 classes; the pad classes
get zero weights and bias -1e4, so their softmax mass is exactly 0 in
bf16/f32 and the zero-padded [19, T+1] conversion matrices absorb the mask
for free (the fused einsum never sees them).

Variants (same batch, same epilogue where comparable):
  A  production headline config: 3 sequential forwards, channel-major
     logits, fused pyrpool tail Pallas kernels + fused_pseudo_soft_cm
  B  3 sequential forwards, NHWC logits (pyrpool branch Pallas auto-on,
     no fused tail), jnp epilogue
  C  ONE vmapped stacked forward, same config as B, identical jnp epilogue
  D  ONE structurally-stacked forward (layers/stacking.py: block-diagonal
     grouped ops, m-major channels, heterogeneous heads padded to 19),
     same config as B, identical jnp epilogue on the m-major logits
  (C/D vs B isolate the stacking effect; A is the number to beat.)

  E  D with the model axis lowered as native feature_group_count=3 over
     per-model-densified blocks (3 WIDE groups, so the known pathological
     narrow-group case does not apply)

RESULT (v5e, 2026-08-20) — a recorded NEGATIVE (analysis in
mspl_tpu/layers/stacking.py header): A 1362.8, B 1022.0, C 922.8,
D 719.9, E 884.4 img/s.  Every stacked lowering loses to the sequential
loop; the s=2.0 encoder is already lane-full and the stacked densification
waste is no longer free.

Results (v5e single chip, via the axon tunnel) are recorded in BASELINE.md
("r4 perf ladder").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
HW = (256, 480)
ITERS = 12
WARMUP = 3
SOURCES = (("camvid", 11), ("cityscapes", 19), ("forest", 5))
PAD_C = 19  # all classifier heads padded to the widest label space


def _build(num_classes, rng_seed, channel_major, jrandom, jnp,
           ESPNetv2Segmentation, init_model, use_pallas):
    model = ESPNetv2Segmentation(num_classes=num_classes, s=2.0,
                                 compute_dtype=jnp.bfloat16,
                                 use_pallas=use_pallas,
                                 channel_major_logits=channel_major)
    variables = init_model(model, HW, rng=jrandom.PRNGKey(rng_seed))
    return model, variables


def _pad_classifier(variables, true_c, jnp):
    """Zero-pad the final classifier (bu_dec_l4 'classify' conv) from true_c
    to PAD_C output channels with bias -1e4 on the pad classes: exp(-1e4-m)
    underflows to exactly 0.0 in f32, so padded classes carry zero softmax
    mass and zero-padded conversion-matrix rows keep the fusion exact."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for k, v in flat.items():
        if "bu_dec_l4" in k and "classify" in k:
            if k[-1] == "kernel" and v.shape[-1] == true_c:
                pad = [(0, 0)] * (v.ndim - 1) + [(0, PAD_C - true_c)]
                v = jnp.pad(v, pad)
            elif k[-1] == "bias" and v.shape[-1] == true_c:
                v = jnp.concatenate(
                    [v, jnp.full((PAD_C - true_c,), -1e4, v.dtype)])
        out[k] = v
    return flax.traverse_util.unflatten_dict(out)


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.data.transforms import normalize
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm
    from mspl_tpu.pseudo.cbst import class_confidence_histograms
    from mspl_tpu.utils.profiling import device_sync

    which = set(sys.argv[1:]) or {"A", "B", "C"}
    rng = jax.random.PRNGKey(0)
    imgs_u8 = jax.random.randint(
        rng, (BATCH, *HW, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    imgs_u8 = jax.device_put(imgs_u8)
    kc = jnp.full((3,), 0.5, jnp.float32)

    mats = [jnp.asarray(label_conversion_matrix(n), jnp.float32)
            for n, _ in SOURCES]
    # [3, PAD_C, T+1]: zero rows for the pad classes
    mats_pad = jnp.stack([
        jnp.pad(m, ((0, PAD_C - m.shape[0]), (0, 0))) for m in mats])

    def timed(fn, x):
        for _ in range(WARMUP):
            out = fn(x)
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x)
        device_sync(out)
        return BATCH * ITERS / (time.perf_counter() - t0)

    def jnp_epilogue(logits_stack):
        """logits_stack: [3, B, H, W, PAD_C] (f32/bf16) -> (label, conf,
        hist); per-model softmax, padded conversion einsum, soft fusion,
        threshold — one whole-stack pass, same math as the fused kernel."""
        p = jax.nn.softmax(logits_stack.astype(jnp.float32), axis=-1)
        q = jnp.einsum("mbhwc,mct->bhwt", p, mats_pad) / len(SOURCES)
        tgt = q[..., :3]
        label = jnp.argmax(tgt, axis=-1).astype(jnp.int32)
        conf = jnp.max(tgt, axis=-1)
        thr = kc[jnp.clip(label, 0, 2)]
        label = jnp.where(conf >= thr, label, 255)
        hist = class_confidence_histograms(label, conf, 3)
        return label, conf, hist

    results = {}

    if "A" in which:
        sources = []
        for i, (name, classes) in enumerate(SOURCES):
            model, variables = _build(classes, 100 + i, True, jrandom, jnp,
                                      ESPNetv2Segmentation, init_model, None)
            sources.append((model, variables))

        @jax.jit
        def pass_a(u8):
            imgs = normalize(u8).astype(jnp.bfloat16)
            logits = [m.apply(v, imgs, train=False) for m, v in sources]
            lab, conf = fused_pseudo_soft_cm(logits, mats, kc=kc)
            return lab, conf, class_confidence_histograms(lab, conf, 3)

        results["A_seq_pallas_headline"] = round(timed(pass_a, imgs_u8), 1)
        print("A", results["A_seq_pallas_headline"], file=sys.stderr,
              flush=True)

    if "B" in which:
        sources = []
        for i, (name, classes) in enumerate(SOURCES):
            model, variables = _build(PAD_C, 100 + i, False, jrandom, jnp,
                                      ESPNetv2Segmentation, init_model,
                                      False)
            variables = _pad_classifier(variables, PAD_C, jnp)
            sources.append((model, variables))

        @jax.jit
        def pass_b(u8):
            imgs = normalize(u8).astype(jnp.bfloat16)
            logits = jnp.stack(
                [m.apply(v, imgs, train=False) for m, v in sources])
            return jnp_epilogue(logits)

        results["B_seq_xla"] = round(timed(pass_b, imgs_u8), 1)
        print("B", results["B_seq_xla"], file=sys.stderr, flush=True)

    if "C" in which:
        model, v0 = _build(PAD_C, 100, False, jrandom, jnp,
                           ESPNetv2Segmentation, init_model, False)
        vs = [v0] + [_build(PAD_C, 101 + i, False, jrandom, jnp,
                            ESPNetv2Segmentation, init_model, False)[1]
                     for i in range(2)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *vs)

        fwd = jax.vmap(lambda v, x: model.apply(v, x, train=False),
                       in_axes=(0, None))

        @jax.jit
        def pass_c(u8):
            imgs = normalize(u8).astype(jnp.bfloat16)
            logits = fwd(stacked, imgs)  # [3, B, H, W, PAD_C]
            return jnp_epilogue(logits)

        results["C_stacked_vmap_xla"] = round(timed(pass_c, imgs_u8), 1)
        print("C", results["C_stacked_vmap_xla"], file=sys.stderr, flush=True)

    if "D" in which:
        from mspl_tpu.layers.stacking import (
            pad_variables_to_template,
            stack_variables,
        )

        members = []
        for i, (name, classes) in enumerate(SOURCES):
            model, variables = _build(classes, 100 + i, False, jrandom, jnp,
                                      ESPNetv2Segmentation, init_model,
                                      False)
            members.append(variables)
        template_model, template = _build(PAD_C, 100, False, jrandom, jnp,
                                          ESPNetv2Segmentation, init_model,
                                          False)
        sv = stack_variables(
            [pad_variables_to_template(v, template) for v in members])
        stacked = ESPNetv2Segmentation(num_classes=PAD_C, s=2.0,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=False, stack=3)

        @jax.jit
        def pass_d(u8):
            imgs = normalize(u8).astype(jnp.bfloat16)
            lo = stacked.apply(sv, imgs, train=False)  # [B,H,W,3*19] m-major
            b_, h_, w_, _ = lo.shape
            logits = jnp.transpose(
                lo.reshape(b_, h_, w_, 3, PAD_C), (3, 0, 1, 2, 4))
            return jnp_epilogue(logits)

        results["D_stacked_blockdiag"] = round(timed(pass_d, imgs_u8), 1)
        print("D", results["D_stacked_blockdiag"], file=sys.stderr,
              flush=True)

    if "E" in which:
        # D with a different model-axis lowering: per-model blocks stay
        # densified (block-diagonal within a model), but the ACROSS-model
        # grouping uses XLA's native feature_group_count=3 — only 3 wide
        # groups, so the known pathological narrow-group case does not
        # apply, and the 3x stacked densification waste of D disappears.
        from mspl_tpu.layers.stacking import (
            pad_variables_to_template,
            stack_variables,
        )
        from mspl_tpu.ops import grouped_conv as gc

        orig = gc.grouped_conv2d

        def fg_stack(x, kernel, *, stride=(1, 1), dilation=(1, 1), groups=1,
                     padding=None):
            kh, kw, cin_g, cout = kernel.shape
            cin = x.shape[-1]
            depthwise = cin_g == 1 and cout == groups
            if groups % 3 or depthwise or groups == 1 or cin % 3:
                return orig(x, kernel, stride=stride, dilation=dilation,
                            groups=groups, padding=padding)
            gm = groups // 3  # per-model group count
            if gm > 1:
                # O axis of the stacked kernel is m-major (m, g, cout_g);
                # densify WITHIN each model: block-diag over g, keeping the
                # (G, i) input axis and (m, g, o) output axis ordering that
                # feature_group_count=3 expects
                kg = kernel.reshape(kh, kw, cin_g, 3, gm, cout // groups)
                eye = jnp.eye(gm, dtype=kernel.dtype)
                dense = jnp.einsum("hwimgo,gG->hwGimgo", kg, eye)
                kernel = dense.reshape(kh, kw, cin // 3, cout)
            ph, pw = padding if padding is not None else (
                dilation[0] * (kh - 1) // 2, dilation[1] * (kw - 1) // 2)
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), stride, [(ph, ph), (pw, pw)],
                rhs_dilation=dilation, feature_group_count=3,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        members = []
        for i, (name, classes) in enumerate(SOURCES):
            model, variables = _build(classes, 100 + i, False, jrandom, jnp,
                                      ESPNetv2Segmentation, init_model,
                                      False)
            members.append(variables)
        template_model, template = _build(PAD_C, 100, False, jrandom, jnp,
                                          ESPNetv2Segmentation, init_model,
                                          False)
        sv = stack_variables(
            [pad_variables_to_template(v, template) for v in members])
        stacked = ESPNetv2Segmentation(num_classes=PAD_C, s=2.0,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=False, stack=3)

        gc.grouped_conv2d = fg_stack
        try:
            @jax.jit
            def pass_e(u8):
                imgs = normalize(u8).astype(jnp.bfloat16)
                lo = stacked.apply(sv, imgs, train=False)
                b_, h_, w_, _ = lo.shape
                logits = jnp.transpose(
                    lo.reshape(b_, h_, w_, 3, PAD_C), (3, 0, 1, 2, 4))
                return jnp_epilogue(logits)

            results["E_stacked_fg3"] = round(timed(pass_e, imgs_u8), 1)
        finally:
            gc.grouped_conv2d = orig
        print("E", results["E_stacked_fg3"], file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
