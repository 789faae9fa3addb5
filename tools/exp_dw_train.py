"""Experiment: train-path depthwise 3x3 as 9 shift-FMAs vs lax conv.

The batch-64 train-step trace (tools/tpu_profile.py --what train --raw)
shows the decoder's lane-starved depthwise/grouped convs (8-40 channels at
128x240) driving XLA into batch-minor layouts: ~30 ms/step of transposing
copies plus ~12 ms of [3,3,1,p] weight-gradient reduce fusions.  A
depthwise 3x3 written as 9 shifted multiply-adds stays in the native
C-minor layout in forward AND backward (dgrad = 9 shift-FMAs with the
rotated kernel, wgrad = 9 multiply-reduces), so XLA never transposes.

Times value_and_grad of a toy loss through one depthwise conv at the
decoder shapes.  Run: python tools/exp_dw_train.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, *args, iters=20, warmup=3):
    from mspl_tpu.utils.profiling import device_sync

    out = None
    for _ in range(warmup):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def dw_lax(x, w):
        # w: [3,3,1,C] flax depthwise layout
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dw_shift(x, w):
        # 9 shift-FMAs in the native layout; zero SAME padding via pad+slice
        c = x.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, wd = x.shape[1], x.shape[2]
        acc = None
        for ky in range(3):
            for kx in range(3):
                t = xp[:, ky:ky + h, kx:kx + wd, :] * w[ky, kx, 0]
                acc = t if acc is None else acc + t
        return acc

    rng = np.random.default_rng(0)
    shapes = [
        ("dec_l1 merge (depthwise 32ch)", (64, 128, 240, 32)),
        ("pyr branch p=8 @2x", (64, 256, 480, 8)),
        ("pyr branch p=8 @1x", (64, 128, 240, 8)),
        ("merge_cbr-ish 40ch", (64, 128, 240, 40)),
    ]
    for name, shp in shapes:
        x = jnp.asarray(rng.normal(size=shp), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 1, shp[-1])), jnp.bfloat16)
        # random cotangent: with a constant one (sum(out)) XLA folds the
        # whole backward away and the timing is fiction
        r = jnp.asarray(rng.normal(size=shp), jnp.bfloat16)

        def loss_lax(w, x):
            return jnp.sum((dw_lax(x, w) * r).astype(jnp.float32))

        def loss_shift(w, x):
            return jnp.sum((dw_shift(x, w) * r).astype(jnp.float32))

        g_lax = jax.jit(jax.value_and_grad(loss_lax, argnums=(0, 1)))
        g_shift = jax.jit(jax.value_and_grad(loss_shift, argnums=(0, 1)))
        f_lax = jax.jit(dw_lax)
        f_shift = jax.jit(dw_shift)

        # parity first
        a = np.asarray(f_lax(x, w), np.float32)
        b = np.asarray(f_shift(x, w), np.float32)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)

        t_f_lax = timed(f_lax, x, w)
        t_f_shift = timed(f_shift, x, w)
        t_g_lax = timed(g_lax, w, x)
        t_g_shift = timed(g_shift, w, x)
        print(f"{name} {shp}:")
        print(f"  fwd      lax {t_f_lax:7.2f} ms   shift {t_f_shift:7.2f} ms")
        print(f"  fwd+bwd  lax {t_g_lax:7.2f} ms   shift {t_g_shift:7.2f} ms")


if __name__ == "__main__":
    main()
