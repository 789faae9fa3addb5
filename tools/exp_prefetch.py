"""Same-process interleaved A/B of the pseudo-sweep h2d prefetch.

The disk-backed end-to-end number moves ±30% day to day with tunnel load
(BASELINE.md "Disk-backed end-to-end"), so cross-day comparisons cannot
attribute a delta to the prefetch commit.  This tool removes the
environment from the comparison: ONE process, ONE compiled generator,
alternating prefetch-on / prefetch-off sweeps (MSPL_PSEUDO_PREFETCH read
per call), medians reported.

Usage: python tools/exp_prefetch.py [n_images] [rounds]
Writes one JSON line with both medians; full series on stderr.
"""

import json
import os
import statistics
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_images: int = 512, rounds: int = 3) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image

    from mspl_tpu.data.datasets import GreenhouseRGBD
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.pseudo.cbst import apply_kc_device, sweep_kc
    from mspl_tpu.pseudo.generate import PseudoLabelGenerator, make_source

    t0 = time.monotonic()

    def hb(msg):
        print(f"[prefetch-ab +{time.monotonic() - t0:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="mspl_prefetch_ab") as root:
        h, w = 256, 480
        lst = []
        for i in range(n_images):
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(f"{root}/img_{i:05d}.png",
                                      compress_level=6)
            lst.append(f"img_{i:05d}.png")
        list_path = f"{root}/list.txt"
        with open(list_path, "w") as f:
            f.write("\n".join(lst) + "\n")
        hb(f"synthesized {n_images} PNGs")

        jrng = jax.random.PRNGKey(0)
        sources = []
        for name, classes in (("camvid", 11), ("cityscapes", 19),
                              ("forest", 5)):
            model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                         compute_dtype=jnp.bfloat16,
                                         channel_major_logits=True)
            variables = init_model(model, (h, w),
                                   rng=jax.random.fold_in(jrng, classes))
            sources.append(make_source(name, model, variables, name,
                                       channel_major=True))
        ds = GreenhouseRGBD(root, list_path, size_wh=(w, h))
        gen = PseudoLabelGenerator(sources)

        def sweep():
            ts = time.perf_counter()
            labels, confs, idx = gen(
                DataLoader(ds, batch_size=128), return_device=True)
            kc = sweep_kc(labels, confs, 3, 0.5)
            np.asarray(apply_kc_device(labels, confs, kc))
            return len(idx) / (time.perf_counter() - ts)

        warm = sweep()  # compile
        hb(f"warmup sweep {warm:.1f} img/s")
        series = {"1": [], "0": []}
        order = ["1", "0"] * rounds
        try:
            for mode in order:
                os.environ["MSPL_PSEUDO_PREFETCH"] = mode
                r = sweep()
                series[mode].append(r)
                hb(f"prefetch={mode}: {r:.1f} img/s")
        finally:
            # an exception mid-sweep must not leak the A/B mode into a
            # longer-lived importing process (ADVICE r4)
            os.environ.pop("MSPL_PSEUDO_PREFETCH", None)
        print(json.dumps({
            "metric": "disk_sweep_prefetch_ab",
            "prefetch_on_median": round(statistics.median(series["1"]), 2),
            "prefetch_off_median": round(statistics.median(series["0"]), 2),
            "on_series": [round(x, 1) for x in series["1"]],
            "off_series": [round(x, 1) for x in series["0"]],
            "n_images": n_images,
        }), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(n, r)
