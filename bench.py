"""Headline benchmark: pseudo-label generation images/sec/chip
(BASELINE.json:2 primary metric).

Workload = BASELINE.json config #3 shape: three ESPNetv2 (s=2.0) source
models (CamVid 11, Cityscapes 19, Forest 5 classes) run over greenhouse-sized
target batches (480x256), per-pixel softmax -> label-space conversion ->
soft fusion -> class-balanced thresholding, all in one jitted pass
(SURVEY.md §3.2 hot loop).  Models run in bfloat16 (MXU), fusion in fp32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference recorded no published numbers (BASELINE.md: "none recorded");
per BASELINE.md the first measured number becomes the operative baseline.
RECORDED_BASELINE below is that round-1 measurement on one v5e chip —
vs_baseline therefore tracks improvement across rounds.
"""

import json
import time

import numpy as np

# round-1 recorded measurement (images/sec/chip on TPU v5e, this script):
# 3x ESPNetv2(s=2.0) bf16 @ 256x480, soft fusion + kc, batch 128.
# (batch sweep r1: 8->78.6, 16->142, 32->189, 64->286, 128->438.9, 256->439)
RECORDED_BASELINE = 438.9  # r1 measurement, lax path, batch 128

BATCH = 128
HW = (256, 480)  # greenhouse canonical H, W (SURVEY registry: 480x256 WxH)
WARMUP = 3
ITERS = 12  # ~1.5 s of steady state; 5 iters showed ±2% run-to-run noise


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: first-ever run pays ~minutes of XLA compiles
    # (3 large models via the remote-TPU tunnel); subsequent runs are warm
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm

    rng = jax.random.PRNGKey(0)
    sources = []
    for name, classes in (("camvid", 11), ("cityscapes", 19), ("forest", 5)):
        # channel-major logits: the final resize einsum emits [B,C,H,W] for
        # free, feeding the fused Pallas pseudo pass with W as lanes
        model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                     compute_dtype=jnp.bfloat16,
                                     channel_major_logits=True)
        variables = init_model(model, HW, rng=jax.random.fold_in(rng, classes))
        sources.append((model, variables, label_conversion_matrix(name)))

    kc = jnp.asarray(np.full(3, 0.5, np.float32))
    mats = [c for _, _, c in sources]

    @jax.jit
    def pseudo_batch(imgs):
        logits = [m.apply(v, imgs, train=False) for m, v, _ in sources]
        return fused_pseudo_soft_cm(logits, mats, kc=kc)

    # cast once on the host side: feeding fp32 makes each of the three
    # models run its own f32->bf16 convert over the full batch
    imgs = jax.device_put(
        jax.random.normal(rng, (BATCH, *HW, 3)).astype(jnp.bfloat16))

    # warmup / compile.  Syncs use a 1-element host fetch, not
    # block_until_ready: the latter can return early through the remote-TPU
    # tunnel (see mspl_tpu/utils/profiling.py::device_sync; the fetch-synced
    # number was cross-checked equal here, 1149.9 vs 1146.8).
    from mspl_tpu.utils.profiling import device_sync

    for _ in range(WARMUP):
        lab, conf = pseudo_batch(imgs)
    device_sync(lab)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        lab, conf = pseudo_batch(imgs)
    device_sync(lab)
    dt = time.perf_counter() - t0

    n_chips = max(jax.device_count(), 1)
    images_per_sec_per_chip = BATCH * ITERS / dt / n_chips
    vs = (images_per_sec_per_chip / RECORDED_BASELINE
          if RECORDED_BASELINE else 1.0)
    print(json.dumps({
        "metric": "pseudo_label_gen_images_per_sec_per_chip",
        "value": round(images_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    # the remote-TPU tunnel occasionally drops a compile/exec request
    # ("response body closed", "TPU device error"); retry a couple of times
    # so a transient doesn't record a failed benchmark
    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20)
