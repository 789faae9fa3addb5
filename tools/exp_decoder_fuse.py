"""Decoder-resolution fusion A/B: throughput + per-pixel agreement (r5).

The exact pipeline upsamples every source model's C_src logits to input
resolution (x2 bilinear per model) and runs softmax/convert/fuse/threshold
on full-resolution tensors.  The decoder-res variant
(`fused_pseudo_soft_decoder_res`) does all of that at the decoder's native
(H/2, W/2) on channel-major logits and upsamples only the fused
(T+1)-channel distribution — 1/4 the fusion pixels and one 4-channel
resize instead of three 11/19/5-channel ones.

Both passes run the SAME models/weights (final_resize toggles only the
tail resize, which has no parameters).  Reports, same process:
  * steady-state img/s for the full bench workload in each mode
  * per-pixel agreement of the FINAL thresholded labels (kc=0.5, the
    bench threshold) over several fresh random batches
  * confidence MAE on agreeing pixels

Run: python tools/exp_decoder_fuse.py [batch] [agree_batches]
Recorded in BASELINE.md r5 ("Decoder-resolution fusion").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HW = (256, 480)
T0 = time.monotonic()


def hb(msg):
    print(f"[decfuse +{time.monotonic() - T0:.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main(batch=128, agree_batches=4):
    hb("importing jax")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.data.transforms import normalize
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm
    from mspl_tpu.pseudo.cbst import class_confidence_histograms
    from mspl_tpu.pseudo.generate import fused_pseudo_soft_decoder_res
    from mspl_tpu.utils.profiling import device_sync

    t = time.perf_counter()
    float(jnp.ones((128, 128)).sum())
    hb(f"first contact {time.perf_counter() - t:.1f}s")

    rng = jax.random.PRNGKey(0)
    full_models, dec_models, variables, mats = [], [], [], []
    for name, classes in (("camvid", 11), ("cityscapes", 19), ("forest", 5)):
        kw = dict(num_classes=classes, s=2.0, compute_dtype=jnp.bfloat16,
                  channel_major_logits=True)
        full_models.append(ESPNetv2Segmentation(**kw))
        dec_models.append(ESPNetv2Segmentation(final_resize=False, **kw))
        variables.append(init_model(full_models[-1], HW,
                                    rng=jax.random.fold_in(rng, classes)))
        mats.append(label_conversion_matrix(name))

    kc = jnp.full((3,), 0.5, jnp.float32)

    def pass_full(imgs_u8):
        imgs = normalize(imgs_u8).astype(jnp.bfloat16)
        logits = [m.apply(v, imgs, train=False)
                  for m, v in zip(full_models, variables)]
        lab, conf = fused_pseudo_soft_cm(logits, mats, kc=kc)
        return lab, conf, class_confidence_histograms(lab, conf, 3)

    def pass_dec(imgs_u8):
        imgs = normalize(imgs_u8).astype(jnp.bfloat16)
        logits = [m.apply(v, imgs, train=False)
                  for m, v in zip(dec_models, variables)]
        lab, conf = fused_pseudo_soft_decoder_res(
            logits, mats, (imgs_u8.shape[1], imgs_u8.shape[2]), kc=kc)
        return lab, conf, class_confidence_histograms(lab, conf, 3)

    jf, jd = jax.jit(pass_full), jax.jit(pass_dec)
    imgs_u8 = jax.device_put(jax.random.randint(
        rng, (batch, *HW, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8))

    def timeit(fn, iters=12):
        out = fn(imgs_u8)
        device_sync((out[0], out[2]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(imgs_u8)
        device_sync((out[0], out[2]))
        return batch * iters / (time.perf_counter() - t0)

    r_full = timeit(jf)
    hb(f"full-res pipeline: {r_full:.1f} img/s")
    r_dec = timeit(jd)
    hb(f"decoder-res pipeline: {r_dec:.1f} img/s")
    # interleave once more to confirm under identical conditions
    r_full2 = timeit(jf)
    r_dec2 = timeit(jd)
    hb(f"repeat: full {r_full2:.1f}, decoder {r_dec2:.1f} img/s")

    agrees, maes, kept_f, kept_d = [], [], [], []
    for i in range(agree_batches):
        x = jax.device_put(jax.random.randint(
            jax.random.PRNGKey(100 + i), (batch, *HW, 3), 0, 256,
            dtype=jnp.int32).astype(jnp.uint8))
        lf, cf, _ = jf(x)
        ld, cd, _ = jd(x)
        lf, ld = np.asarray(lf), np.asarray(ld)
        cf, cd = np.asarray(cf), np.asarray(cd)
        same = lf == ld
        agrees.append(float(same.mean()))
        maes.append(float(np.abs(cf - cd)[same].mean()))
        kept_f.append(float((lf != 255).mean()))
        kept_d.append(float((ld != 255).mean()))
        hb(f"batch {i}: agreement {agrees[-1]:.5f}, conf MAE {maes[-1]:.5f}")

    print(json.dumps({
        "metric": "decoder_res_fusion_ab",
        "full_img_s": [round(r_full, 1), round(r_full2, 1)],
        "decoder_img_s": [round(r_dec, 1), round(r_dec2, 1)],
        "speedup": round((r_dec + r_dec2) / (r_full + r_full2), 3),
        "label_agreement": round(float(np.mean(agrees)), 5),
        "agreement_min": round(float(np.min(agrees)), 5),
        "conf_mae_on_agreeing": round(float(np.mean(maes)), 6),
        "kept_frac_full": round(float(np.mean(kept_f)), 4),
        "kept_frac_decoder": round(float(np.mean(kept_d)), 4),
        "batch": batch,
    }), flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(b, n)
