"""Reference-equivalent anchors for the headline benchmark (VERDICT r1
item 5: make bench.py's `vs_baseline` mean "vs reference-equivalent").

Two anchors, same workload as bench.py (3 ESPNetv2 s=2.0 sources —
CamVid 11 / Cityscapes 19 / Forest 5 — over 256x480 target batches,
softmax -> label-space conversion -> soft fusion -> threshold):

  torch      the literal reference stack: the torch twin models
             (mspl_tpu/oracle/torch_espnetv2.py, fp32 NCHW eval) + a torch
             softmax/convert/fuse/threshold pipeline, on this host's CPU.
             NOTE this container exposes ONE CPU core; record the number
             with that caveat (the reference itself targeted CUDA GPUs we
             don't have — no number for those is fabricated here).

  jnp_naive  a direct port of the reference pipeline to the TPU chip with
             NO TPU-first design: fp32 everywhere, one dispatch per model,
             separate softmax/convert/fuse/threshold steps, no fused
             kernels, no channel-major layouts.  Same chip as bench.py, so
             value/jnp_naive is a like-for-like "vs a straight port"
             speedup — this is the anchor bench.py reports against.

Run: python bench_anchor.py [torch|jnp_naive|both]
Measured results are recorded in BASELINE.md ("Anchors" section).
"""

import json
import sys
import time

import numpy as np

HW = (256, 480)
SOURCES = (("camvid", 11), ("cityscapes", 19), ("forest", 5))


def bench_torch(batch=2, iters=2):
    import torch

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.oracle.torch_espnetv2 import TESPNetv2Segmentation

    torch.set_grad_enabled(False)
    models, mats = [], []
    for name, classes in SOURCES:
        m = TESPNetv2Segmentation(num_classes=classes, s=2.0)
        m.eval()
        models.append(m)
        mats.append(torch.from_numpy(
            np.asarray(label_conversion_matrix(name), np.float32)))

    x = torch.randn(batch, 3, *HW)
    kc = torch.full((3,), 0.5)

    def pipeline():
        acc = None
        for m, mat in zip(models, mats):
            p = torch.softmax(m(x), dim=1)  # [B,C,H,W]
            q = torch.einsum("bchw,ct->bthw", p, mat)
            acc = q if acc is None else acc + q
        fused = acc / len(models)
        tgt = fused[:, :3]
        conf, label = tgt.max(dim=1)
        thr = kc[label.clamp(max=2)]
        label = torch.where(conf >= thr, label, torch.full_like(label, 255))
        return label, conf

    pipeline()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        lab, conf = pipeline()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_jnp_naive(batch=32, iters=6):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.ops import pallas_pyrpool
    from mspl_tpu.utils.profiling import device_sync

    # a straight port knows nothing about Pallas: force the jnp branch stack
    # (EfficientPyrPool's auto mode would otherwise switch the kernel in)
    pallas_pyrpool.pyr_branches_pallas = pallas_pyrpool.pyr_branches_jnp

    rng = jax.random.PRNGKey(0)
    sources = []
    for name, classes in SOURCES:
        # fp32, NHWC, lax path only — a straight port, no TPU-first design
        model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                     compute_dtype=jnp.float32)
        variables = init_model(model, HW, rng=jax.random.fold_in(rng, classes))
        sources.append((model, variables, jnp.asarray(
            label_conversion_matrix(name), jnp.float32)))

    kc = jnp.full((3,), 0.5, jnp.float32)

    # one dispatch per model + one per fusion stage, mirroring the
    # reference's per-batch loop structure (SURVEY.md §3.2)
    fwd = [jax.jit(lambda v, x, m=m: m.apply(v, x, train=False))
           for m, _, _ in sources]

    @jax.jit
    def soft_convert(logits, mat):
        return jnp.einsum("bhwc,ct->bhwt",
                          jax.nn.softmax(logits, axis=-1), mat)

    @jax.jit
    def fuse_threshold(qs):
        fused = sum(qs) / len(qs)
        tgt = fused[..., :3]
        label = jnp.argmax(tgt, axis=-1).astype(jnp.int32)
        conf = jnp.max(tgt, axis=-1)
        thr = kc[jnp.clip(label, 0, 2)]
        return jnp.where(conf >= thr, label, 255), conf

    imgs = jax.random.normal(rng, (batch, *HW, 3), jnp.float32)

    def pipeline():
        qs = [soft_convert(f(v, imgs), mat)
              for f, (_, v, mat) in zip(fwd, sources)]
        return fuse_threshold(qs)

    for _ in range(2):
        lab, conf = pipeline()
    device_sync(lab)
    t0 = time.perf_counter()
    for _ in range(iters):
        lab, conf = pipeline()
    device_sync(lab)
    dt = time.perf_counter() - t0
    return batch * iters / dt / max(jax.device_count(), 1)


def measure_and_write_anchor() -> float:
    """Measure jnp_naive and record anchor + date into ANCHOR.json for
    bench.py to embed in its JSON line so every BENCH_rN.json is
    self-contained (VERDICT r3 item 7).  The anchor is load-sensitive
    through the axon tunnel — bench.py's child calls this in-process right
    after a live headline (same device session, no second first-contact
    cost; VERDICT r4 item 5 same-day discipline)."""
    import os

    value = round(bench_jnp_naive(), 3)
    anchor = {"jnp_naive_img_per_sec_per_chip": value,
              "date": time.strftime("%Y-%m-%d")}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ANCHOR.json")
    with open(path, "w") as f:
        json.dump(anchor, f)
    print(f"[anchor] wrote {path}", file=sys.stderr)
    return value


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    if which in ("jnp_naive", "both"):
        out["jnp_naive_img_per_sec_per_chip"] = measure_and_write_anchor()
    if which in ("torch", "both"):
        out["torch_cpu_img_per_sec"] = round(bench_torch(), 4)
        out["torch_cpu_cores"] = __import__("os").cpu_count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
