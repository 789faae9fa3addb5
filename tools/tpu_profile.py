"""Capture a jax.profiler device trace of the headline bench pipeline and
print a per-op time table (the trace-driven method BASELINE.md's perf ladder
was built with, packaged as a tool).

Usage:
    python tools/tpu_profile.py [--what pseudo|train] [--top 40] [--iters 3]
    python tools/tpu_profile.py --logdir /tmp/prof_xyz --top 40   # re-parse

Parses the xplane.pb with tensorflow's bundled proto (tensorboard's own
converter is broken against the installed protobuf), aggregates device-plane
event durations by op name, and prints the top-N with a fraction of total
device time.  Works through the axon remote-TPU tunnel (device plane shows
up as '/device:TPU:0 (remote)'-style; we take every plane whose name
mentions TPU and isn't a host thread plane).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(what: str, iters: int, batch: int) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mspl_tpu.utils.profiling import device_sync

    logdir = tempfile.mkdtemp(prefix="mspl_prof_")
    rng = jax.random.PRNGKey(0)

    if what == "pseudo":
        from mspl_tpu.data.label_space import label_conversion_matrix
        from mspl_tpu.data.transforms import normalize
        from mspl_tpu.models import ESPNetv2Segmentation, init_model
        from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm
        from mspl_tpu.pseudo.cbst import class_confidence_histograms

        HW = (256, 480)
        sources = []
        for name, classes in (("camvid", 11), ("cityscapes", 19), ("forest", 5)):
            # same env switches as bench.py, so a trace can explain a bench A/B
            model = ESPNetv2Segmentation(num_classes=classes, s=2.0,
                                         compute_dtype=jnp.bfloat16,
                                         channel_major_logits=True,
                                         fuse_stages=bool(int(os.environ.get(
                                             "MSPL_FUSE_STAGES", "0"))),
                                         layout_contract=bool(int(
                                             os.environ.get(
                                                 "MSPL_LAYOUT_CONTRACT",
                                                 "0"))))
            variables = init_model(model, HW, rng=jax.random.fold_in(rng, classes))
            sources.append((model, variables, label_conversion_matrix(name)))
        kc = jnp.asarray(np.full(3, 0.5, np.float32))
        mats = [c for _, _, c in sources]

        @jax.jit
        def step(imgs_u8):
            imgs = normalize(imgs_u8).astype(jnp.bfloat16)
            logits = [m.apply(v, imgs, train=False) for m, v, _ in sources]
            lab, conf = fused_pseudo_soft_cm(logits, mats, kc=kc)
            hist = class_confidence_histograms(lab, conf, 3)
            return lab, conf, hist

        args = (jax.device_put(jax.random.randint(
            rng, (batch, *HW, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8)),)
    elif what == "train":
        from mspl_tpu.engine.schedules import build_schedule
        from mspl_tpu.engine.train import (build_optimizer, create_train_state,
                                           make_train_step)
        from mspl_tpu.models import ESPNetv2Segmentation, init_model

        HW = (256, 480)
        batch = batch if batch != 128 else 64
        model = ESPNetv2Segmentation(num_classes=11, s=2.0,
                                     compute_dtype=jnp.bfloat16,
                                     cm_decoder=bool(int(os.environ.get(
                                         "MSPL_PROF_CM", "0"))))
        variables = init_model(model, HW)
        tx = build_optimizer("sgd", build_schedule("fixed", 0.009, 1000))
        state = create_train_state(model, variables, tx)
        tstep = make_train_step(model, crop_hw=HW, augment=True, donate=False)
        key = jax.random.PRNGKey(1)
        imgs = jax.device_put(jax.random.randint(
            rng, (batch, *HW, 3), 0, 256, dtype=jnp.int32).astype(jnp.uint8))
        labs = jax.device_put(jax.random.randint(
            rng, (batch, *HW), 0, 11, dtype=jnp.int32))

        def step(state):
            return tstep(state, {"image": imgs, "label": labs}, key)

        args = (state,)
    else:
        raise SystemExit(f"unknown --what {what}")

    # warmup/compile outside the trace
    out = step(*args)
    if what == "train":
        args = (out[0],)
        out = step(*args)
    device_sync(out)

    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = step(*args)
            if what == "train":
                args = (out[0],)
        # sync on a SMALL leaf only: fetching large arrays while the axon
        # profiler is active raises INVALID_ARGUMENT (observed on the train
        # step); the loss/labels leaf is enough to drain the dispatch chain
        device_sync(out[1] if what == "train" else out[0])
    print(f"trace written to {logdir}", file=sys.stderr)
    return logdir


def parse(logdir: str, top: int, iters: int, merge_fusions: bool):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())

    # 'XLA Ops' is the serial device timeline (sums to wall clock); 'Async
    # XLA Ops' spans overlap compute (weight prefetch DMAs etc.) and must
    # not be mixed in, or copy-start dominates a fictitious total.
    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_bytes = collections.Counter()  # HLO cost-model bytes_accessed
    per_flops = collections.Counter()
    async_total = 0.0
    total = 0
    for plane in space.planes:
        if not plane.name.startswith("/device:"):
            continue
        ev_meta = plane.event_metadata
        sm = {k: v.name for k, v in plane.stat_metadata.items()}
        meta_cost = {}  # metadata_id -> (bytes, flops)
        for mid, md in ev_meta.items():
            b = fl = 0
            for s in md.stats:
                nmst = sm.get(s.metadata_id)
                if nmst == "bytes_accessed":
                    b = s.int64_value or s.uint64_value
                elif nmst == "flops":
                    fl = s.int64_value or s.uint64_value
            meta_cost[mid] = (b, fl)
        for line in plane.lines:
            if line.name == "Async XLA Ops":
                async_total += sum(e.duration_ps for e in line.events) / 1e12
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                nm = md.name if md else "?"
                dur = ev.duration_ps / 1e12
                key = nm
                if merge_fusions:
                    key = re.sub(r"\.\d+$", "", nm.split(" = ")[0])
                b, fl = meta_cost.get(ev.metadata_id, (0, 0))
                per_op[key] += dur
                per_bytes[key] += b
                per_flops[key] += fl
                cat = key.split(".")[0].split("(")[0]
                per_cat[cat] += dur
                total += dur

    # achieved rates vs the chip's rooflines tell WHAT bounds each op:
    # ~GB/s near HBM peak => memory-bound at roofline (irreducible without
    # less traffic); low GB/s AND low TFLOP/s => issue/latency-bound
    # (kernel/layout problem); high TFLOP/s => MXU-bound.
    print(f"\ndevice busy ('XLA Ops'): {total * 1e3:.2f} ms over {iters} "
          f"iter(s) = {total * 1e3 / max(iters, 1):.2f} ms/iter   "
          f"(async DMA spans, overlapped: "
          f"{async_total * 1e3 / max(iters, 1):.1f} ms/iter)")
    print(f"\n== top {top} ops (summed over trace; GB/s + TFLOP/s are "
          "achieved rates from the HLO cost model) ==")
    for nm, t in per_op.most_common(top):
        gbs = per_bytes[nm] / t / 1e9 if t else 0.0
        tf = per_flops[nm] / t / 1e12 if t else 0.0
        print(f"{t * 1e3 / max(iters, 1):9.3f} ms/iter  "
              f"{100 * t / total:5.1f}%  {gbs:7.1f} GB/s  {tf:6.2f} TF/s  "
              f"{nm[:80]}")
    print("\n== by category ==")
    for nm, t in per_cat.most_common(25):
        print(f"{t * 1e3 / max(iters, 1):9.3f} ms/iter  {100 * t / total:5.1f}%  {nm[:80]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="pseudo", choices=("pseudo", "train"))
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--logdir", default=None,
                    help="re-parse an existing trace instead of capturing")
    ap.add_argument("--raw", action="store_true",
                    help="keep per-instance op names (no .N suffix merge)")
    a = ap.parse_args()
    logdir = a.logdir or capture(a.what, a.iters, a.batch)
    parse(logdir, a.top, a.iters, merge_fusions=not a.raw)
