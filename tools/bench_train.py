"""Packed-dispatch train-step timing at the production shape (batch 64,
256x480, camvid 11 classes, ESPNetv2 s=2.0 bf16) — the harness behind
BASELINE.md's "Secondary: training-step throughput" table.

Usage: python tools/bench_train.py [--batch 64] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cm", action="store_true",
                    help="channel-major train decoder (cm_decoder=True)")
    ap.add_argument("--cml", action="store_true",
                    help="with --cm: channel-major logits into the loss "
                         "(channel_major_logits=True; no exit transpose)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.engine.packing import StatePacker
    from mspl_tpu.engine.schedules import build_schedule
    from mspl_tpu.engine.train import (build_optimizer, create_train_state,
                                       make_train_step)
    from mspl_tpu.models import ESPNetv2Segmentation, init_model
    from mspl_tpu.utils.profiling import device_sync

    HW = (256, 480)
    model = ESPNetv2Segmentation(num_classes=11, s=2.0,
                                 compute_dtype=jnp.bfloat16,
                                 cm_decoder=args.cm,
                                 channel_major_logits=args.cml)
    variables = init_model(model, HW)
    tx = build_optimizer("sgd", build_schedule("fixed", 0.009, 1000))
    state = create_train_state(model, variables, tx)
    packer = StatePacker(state)
    tstep = make_train_step(model, crop_hw=HW, packer=packer)
    packed = jax.jit(packer.pack)(state)

    rng = jax.random.PRNGKey(0)
    key = jax.random.PRNGKey(1)
    batch = {
        "image": jax.device_put(jax.random.randint(
            rng, (args.batch, *HW, 3), 0, 256,
            dtype=jnp.int32).astype(jnp.uint8)),
        "label": jax.device_put(jax.random.randint(
            rng, (args.batch, *HW), 0, 11, dtype=jnp.int32)),
    }

    for _ in range(3):  # compile + program load
        packed, metrics = tstep(packed, batch, key)
    device_sync(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        packed, metrics = tstep(packed, batch, key)
    device_sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step b{args.batch}{' cm' if args.cm else ''}: "
          f"{'cml ' if args.cml else ''}"
          f"{dt * 1e3:.1f} ms/step  {args.batch / dt:.1f} img/s")


if __name__ == "__main__":
    main()
