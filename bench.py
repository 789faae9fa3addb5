"""Headline benchmark: pseudo-label generation images/sec/chip
(BASELINE.json:2 primary metric).

Workload = BASELINE.json config #3, the FULL per-batch pseudo workload
(SURVEY.md §3.2 hot loop — VERDICT r1 item 6): uint8 target batch ->
device-side mean/std normalization -> three ESPNetv2 (s=2.0, bf16) source
models (CamVid 11, Cityscapes 19, Forest 5 classes) at 480x256 -> fused
softmax -> label-space conversion -> soft fusion -> kc threshold -> per-class
CBST confidence-histogram accumulation, all in ONE jitted program per batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is anchored to the REFERENCE-EQUIVALENT pipeline on the same
chip (VERDICT r1 item 5): a straight fp32/NHWC/unfused port of the
reference's per-batch loop measured by bench_anchor.py (jnp_naive mode).
The literal torch-CPU reference pipeline is also recorded in BASELINE.md
("Anchors") — this container has 1 CPU core, so that number carries a
hardware caveat and is not used as the divisor.
"""

import json
import sys
import time

import numpy as np

# Anchors (see BASELINE.md "Anchors"; re-measure with bench_anchor.py):
#   reference-equivalent straight port on this chip (fp32, NHWC, unfused,
#   one dispatch per model).  Load-sensitive through the axon tunnel, so it
#   is re-measured and dated each round: r2 2026-08-17 -> 254.7; r3
#   2026-08-19 -> 310.9 (same day as the r3 headline runs).
JNP_NAIVE_ANCHOR = 310.9
#   round-1 first-draft fused-jnp measurement (historical, for continuity
#   with BENCH_r01.json whose vs_baseline divided by this):
R1_RECORDED = 438.9

BATCH = 128
HW = (256, 480)  # greenhouse canonical H, W (SURVEY registry: 480x256 WxH)
NUM_TARGET = 3
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
    from mspl_tpu.data.transforms import normalize
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm
    from mspl_tpu.pseudo.cbst import class_confidence_histograms

    rng = jax.random.PRNGKey(0)
    sources = []
    for name, classes in (("camvid", 11), ("cityscapes", 19), ("forest", 5)):
        # channel-major logits: the final resize einsum emits [B,C,H,W] for
        # free, feeding the fused Pallas pseudo pass with W as lanes
        import os
        model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                     compute_dtype=jnp.bfloat16,
                                     channel_major_logits=True,
                                     fuse_stages=bool(int(os.environ.get(
                                         "MSPL_FUSE_STAGES", "0"))),
                                     layout_contract=bool(int(os.environ.get(
                                         "MSPL_LAYOUT_CONTRACT", "0"))))
        variables = init_model(model, HW, rng=jax.random.fold_in(rng, classes))
        sources.append((model, variables, label_conversion_matrix(name)))

    kc = jnp.asarray(np.full(NUM_TARGET, 0.5, np.float32))
    mats = [c for _, _, c in sources]

    def _pass(imgs_u8):
        # full workload: normalize (device-side, as the real loader path
        # does) -> single bf16 cast -> 3 forwards -> fused pass -> CBST
        # histogram accumulation for the next round's kc
        imgs = normalize(imgs_u8).astype(jnp.bfloat16)
        logits = [m.apply(v, imgs, train=False) for m, v, _ in sources]
        lab, conf = fused_pseudo_soft_cm(logits, mats, kc=kc)
        hist = class_confidence_histograms(lab, conf, NUM_TARGET)
        return lab, conf, hist

    # per-chip semantics (VERDICT r2 item 9): on a multi-chip host the
    # batch is sharded over a pure-DP mesh (shard_map, the production
    # pattern from pseudo/generate.py — Pallas calls stay shard-local) so
    # dividing by device_count is correct by construction; the 1-chip
    # bench host takes the plain jit path
    n_chips = max(jax.device_count(), 1)
    imgs_u8 = jax.random.randint(
        rng, (BATCH, *HW, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
    if n_chips > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mspl_tpu.parallel.mesh import make_mesh_for_batch

        mesh = make_mesh_for_batch(BATCH)
        assert mesh.shape["data"] == n_chips, (
            f"BATCH {BATCH} not shardable over {n_chips} chips; per-chip "
            "number would be wrong")

        def _sharded(imgs_u8):
            lab, conf, hist = _pass(imgs_u8)
            return lab, conf, jax.lax.psum(hist, "data")

        from jax import shard_map

        pseudo_batch = jax.jit(shard_map(
            _sharded, mesh=mesh, in_specs=P("data"),
            out_specs=(P("data"), P("data"), P()), check_vma=False))
        imgs_u8 = jax.device_put(imgs_u8, NamedSharding(mesh, P("data")))
    else:
        pseudo_batch = jax.jit(_pass)
        imgs_u8 = jax.device_put(imgs_u8)

    # warmup / compile.  Syncs use a 1-element host fetch, not
    # block_until_ready: the latter can return early through the remote-TPU
    # tunnel (see mspl_tpu/utils/profiling.py::device_sync; the fetch-synced
    # number was cross-checked equal here, 1149.9 vs 1146.8).
    from mspl_tpu.utils.profiling import device_sync

    for _ in range(WARMUP):
        lab, conf, hist = pseudo_batch(imgs_u8)
    device_sync((lab, hist))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        lab, conf, hist = pseudo_batch(imgs_u8)
    device_sync((lab, hist))
    dt = time.perf_counter() - t0

    images_per_sec_per_chip = BATCH * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "pseudo_label_gen_images_per_sec_per_chip",
        "value": round(images_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / JNP_NAIVE_ANCHOR, 3),
        "baseline_anchor": "reference-equivalent straight port on same chip "
                           f"({JNP_NAIVE_ANCHOR} img/s, bench_anchor.py)",
        "vs_r1_first_draft": round(images_per_sec_per_chip / R1_RECORDED, 3),
    }))


def main_io(n_images: int = 512, cache: bool = False):
    """Disk-backed end-to-end mode (VERDICT r2 item 3): real PNGs on disk ->
    native C++ batch decode -> host->device DMA -> the same full device
    workload.  This is the like-for-like number against the reference's
    disk-mediated batch job (SURVEY.md §3.2 DISK BOUNDARY); the default
    `main()` times the device pipeline alone.  `--io-cache` additionally
    enables the bounded decoded-uint8 cache and sweeps the set twice,
    reporting the second (cached) sweep — the self-training steady state."""
    import tempfile

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.cli import _save_model
    from mspl_tpu.data.datasets import GreenhouseRGBD
    from mspl_tpu.data.label_io import save_label_png
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.generate import generate_pseudo_labels, make_source
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="mspl_bench_io") as root:
        # synthesize a PNG target set at the canonical greenhouse size
        h, w = HW
        lst = []
        from PIL import Image

        for i in range(n_images):
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{root}/img_{i:05d}.png",
                                      compress_level=6)
            lst.append(f"img_{i:05d}.png")
        list_path = f"{root}/list.txt"
        with open(list_path, "w") as f:
            f.write("\n".join(lst) + "\n")
        print(f"[io] synthesized {n_images} PNGs", file=sys.stderr, flush=True)

        jrng = jax.random.PRNGKey(0)
        sources = []
        for name, classes in (("camvid", 11), ("cityscapes", 19),
                              ("forest", 5)):
            model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                         compute_dtype=jnp.bfloat16,
                                         channel_major_logits=True)
            variables = init_model(model, HW,
                                   rng=jax.random.fold_in(jrng, classes))
            sources.append(make_source(name, model, variables, name,
                                       channel_major=True))

        ds = GreenhouseRGBD(root, list_path, size_wh=(w, h))
        if cache:
            ds.enable_cache(4 << 30)

        # Component rates, reported alongside the end-to-end number so the
        # reader can tell WHAT bounds it (BASELINE.md "Disk-backed
        # end-to-end"): the host decode rate is reproducible (1-core zlib
        # inflate); the h2d rate through this environment's remote-TPU
        # tunnel fluctuates 3-25 MB/s with server load and dominates the
        # end-to-end number whenever it dips (a locally-attached TPU does
        # tens of GB/s and would leave the decode rate as the bound).
        t0 = time.perf_counter()
        for b in DataLoader(ds, batch_size=BATCH):
            b["image"][0].sum()  # touch; stays on host
        decode_rate = n_images / (time.perf_counter() - t0)
        print(f"[io] decode-only: {decode_rate:.1f} img/s", file=sys.stderr,
              flush=True)

        one = np.zeros((BATCH, h, w, 3), np.uint8)
        jax.device_put(one).block_until_ready()  # warm the transfer path
        t0 = time.perf_counter()
        jax.device_put(one).block_until_ready()
        h2d_mbps = one.nbytes / (time.perf_counter() - t0) / 1e6
        print(f"[io] h2d: {h2d_mbps:.1f} MB/s", file=sys.stderr, flush=True)

        # production cmd_pseudo flow: device-resident result set, CBST kc
        # sweep + re-threshold on device, ONE uint8 label fetch for the set
        from mspl_tpu.pseudo.cbst import apply_kc_device, sweep_kc

        def sweep():
            t0 = time.perf_counter()
            labels, confs, idx = generate_pseudo_labels(
                sources, DataLoader(ds, batch_size=BATCH),
                return_device=True)
            kc = sweep_kc(labels, confs, NUM_TARGET, 0.5)
            np.asarray(apply_kc_device(labels, confs, kc))
            return len(idx) / (time.perf_counter() - t0)

        r0 = sweep()  # warmup sweep: compiles; with --io-cache also fills it
        print(f"[io] warmup sweep done ({r0:.1f} img/s)", file=sys.stderr,
              flush=True)
        rate = sweep()
        print(json.dumps({
            "metric": ("pseudo_label_gen_images_per_sec_disk_cached" if cache
                       else "pseudo_label_gen_images_per_sec_disk"),
            "value": round(rate, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(rate / JNP_NAIVE_ANCHOR, 3),
            "n_images": n_images,
            "decode_only_img_per_sec": round(decode_rate, 1),
            "h2d_MBps": round(h2d_mbps, 1),
            "note": "end-to-end: PNG decode -> DMA -> device pipeline"
                    + (" (decoded-uint8 cache hot)" if cache else ""),
        }))


if __name__ == "__main__":
    import sys

    io_mode = "--io" in sys.argv or "--io-cache" in sys.argv
    # the remote-TPU tunnel occasionally drops a compile/exec request
    # ("response body closed", "TPU device error"); retry a couple of times
    # so a transient doesn't record a failed benchmark
    for attempt in range(3):
        try:
            if io_mode:
                main_io(cache="--io-cache" in sys.argv)
            else:
                main()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20)
