"""Same-process interleaved A/B of two-deep dispatch pipelining in the
host-path pseudo sweep (VERDICT r4 item 7).

With MSPL_PSEUDO_PIPELINE=1 (default) the sweep dispatches batch k+1's
compute BEFORE fetching batch k's results, so the device works through the
host's d2h fetch + numpy filtering; =0 restores the serial
dispatch->fetch order.  Cross-day numbers cannot attribute a delta
(tunnel load ±30%), so: ONE process, ONE compiled generator, alternating
on/off sweeps, medians reported.  The toggle only affects the host path
(`return_device=False`); the device-resident path never blocks per batch.

Usage: python tools/exp_pipeline.py [n_images] [rounds]
Result recorded in BASELINE.md (r5).
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
    from mspl_tpu.pseudo.generate import PseudoLabelGenerator, make_source

    t0 = time.monotonic()

    def hb(msg):
        print(f"[pipeline-ab +{time.monotonic() - t0:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    t = time.perf_counter()
    float(jnp.ones((128, 128)).sum())
    hb(f"first contact {time.perf_counter() - t:.1f}s")

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="mspl_pipeline_ab") as root:
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
        ds.enable_cache(4 << 30)  # isolate dispatch/fetch from decode
        gen = PseudoLabelGenerator(sources)

        def sweep():
            ts = time.perf_counter()
            labels, confs, idx = gen(DataLoader(ds, batch_size=128))
            assert labels.shape[0] == n_images
            return n_images / (time.perf_counter() - ts)

        warm = sweep()  # compile + fill decode cache
        hb(f"warmup sweep {warm:.1f} img/s")
        # MSPL_AB_ORDER flips which arm goes first in each pair — a strong
        # tunnel-load time trend otherwise biases the comparison (seen r5:
        # both arms monotonically improving while a degraded tunnel
        # recovered)
        order = list(os.environ.get("MSPL_AB_ORDER", "10"))
        series = {"1": [], "0": []}
        try:
            for mode in order * rounds:
                os.environ["MSPL_PSEUDO_PIPELINE"] = mode
                r = sweep()
                series[mode].append(r)
                hb(f"pipeline={mode}: {r:.1f} img/s")
        finally:
            os.environ.pop("MSPL_PSEUDO_PIPELINE", None)
        print(json.dumps({
            "metric": "host_sweep_dispatch_pipeline_ab",
            "pipeline_on_median": round(statistics.median(series["1"]), 2),
            "pipeline_off_median": round(statistics.median(series["0"]), 2),
            "on_series": [round(x, 1) for x in series["1"]],
            "off_series": [round(x, 1) for x in series["0"]],
            "n_images": n_images,
        }), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(n, r)
