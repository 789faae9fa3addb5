"""A/B: per-round cost of rebuilding the generation pass vs reusing it
(VERDICT r4 item 3).

The self-training round loop swaps NEW target weights in every round.  The
r4 code rebuilt `generate_pseudo_labels` per round — weights baked as jit
constants — paying trace + compile-cache load + device program load each
time (~31 s/round through the axon remote-TPU tunnel, r4 measurement).  The
r5 `PseudoLabelGenerator(params_as_args=True)` feeds weights as arguments:
rounds >= 2 reuse ONE compiled program and `set_variables` is free.

Workload: the production ensemble shape — 3 ESPNetv2 s=2.0 bf16
channel-major sources + 1 fine-tuned target (4 forwards) at 256x480 —
sweeping a small in-memory set so the per-round REBUILD cost dominates the
sweep itself.  Run: python tools/exp_reuse_rounds.py [n_images] [rounds]
Result recorded in BASELINE.md ("Round-loop program reuse").
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
    print(f"[reuse +{time.monotonic() - T0:.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main(n_images=64, rounds=2):
    hb("importing jax")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.pseudo.generate import PseudoLabelGenerator, make_source

    t = time.perf_counter()
    float(jnp.ones((128, 128)).sum())
    hb(f"first contact {time.perf_counter() - t:.1f}s")

    rng = jax.random.PRNGKey(0)
    sources = []
    for name, classes in (("camvid", 11), ("cityscapes", 19), ("forest", 5)):
        model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                     compute_dtype=jnp.bfloat16,
                                     channel_major_logits=True)
        v = init_model(model, HW, rng=jax.random.fold_in(rng, classes))
        sources.append(make_source(name, model, v, name, channel_major=True))
    tmodel = ESPNetv2Segmentation(num_classes=3, s=2.0,
                                  compute_dtype=jnp.bfloat16,
                                  channel_major_logits=True)

    def target_source(seed):
        tv = init_model(tmodel, HW, rng=jax.random.PRNGKey(seed))
        return make_source("target", tmodel, tv, "greenhouse",
                           channel_major=True)

    ds = SyntheticSegmentation(num_classes=3, size_wh=HW[::-1],
                               length=n_images, seed=1, unlabeled=True)

    def loader():
        return DataLoader(ds, batch_size=32)

    hb("building reusable generator (4 forwards, params as args)")
    ensemble = list(sources) + [target_source(100)]
    gen = PseudoLabelGenerator(ensemble, params_as_args=True)
    t = time.perf_counter()
    gen(loader(), return_device=True)
    hb(f"initial compile+sweep {time.perf_counter() - t:.1f}s")

    reuse_times, rebuild_times = [], []
    for r in range(rounds):
        # --- reuse path: new weights as arguments, same program
        tsrc = target_source(200 + r)
        t = time.perf_counter()
        gen.set_variables(3, tsrc.variables)
        gen(loader(), return_device=True)
        reuse_times.append(time.perf_counter() - t)
        assert gen.trace_count == 1
        hb(f"round {r} REUSE sweep {reuse_times[-1]:.1f}s")

        # --- rebuild path (r4 behavior): fresh generator, weights baked
        t = time.perf_counter()
        fresh = PseudoLabelGenerator(list(sources) + [tsrc])
        fresh(loader(), return_device=True)
        rebuild_times.append(time.perf_counter() - t)
        hb(f"round {r} REBUILD sweep {rebuild_times[-1]:.1f}s")

    print(json.dumps({
        "metric": "selftrain_round_generation_wall_s",
        "reuse_median_s": round(float(np.median(reuse_times)), 2),
        "rebuild_median_s": round(float(np.median(rebuild_times)), 2),
        "reuse_series": [round(x, 1) for x in reuse_times],
        "rebuild_series": [round(x, 1) for x in rebuild_times],
        "n_images": n_images,
        "note": "reuse = set_variables + sweep on ONE compiled program; "
                "rebuild = fresh PseudoLabelGenerator per round (r4 "
                "behavior, weights as jit constants)",
    }), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(n, r)
