"""A/B: grouped 1x1 conv formulations inside the lax EESP stage path.

Variants (same math):
  dense  — block-diagonal densified dense conv (production default)
  slices — per-group lane-slice dots + concat (the stage-kernel v2 trick
           at the XLA level; cuts the G-fold MXU densification waste)

Usage: python tools/exp_grouped_1x1.py [stage3|stage4]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(which):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import mspl_tpu.ops.grouped_conv as gc
    from mspl_tpu.layers.eesp import EESP, branch_dilations
    from mspl_tpu.utils.profiling import device_sync

    cfg = {
        "stage3": dict(n_units=3, c=256, hw=(32, 60), k=4, r_lim=9),
        "stage4": dict(n_units=7, c=512, hw=(16, 30), k=4, r_lim=7),
    }[which]

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(128, *cfg["hw"], cfg["c"]) * 0.5, jnp.bfloat16)
    blocks = [EESP(cfg["c"], stride=1, k=cfg["k"], r_lim=cfg["r_lim"])
              for _ in range(cfg["n_units"])]
    vs, y = [], x
    for i, blk in enumerate(blocks):
        v = blk.init(jax.random.PRNGKey(i), y, train=False)
        vs.append(v)
        y = blk.apply(v, y, train=False)

    orig = gc.grouped_conv2d

    def sliced_1x1(xx, kernel, *, stride=(1, 1), dilation=(1, 1), groups=1,
                   padding=None):
        kh, kw, cin_g, cout = kernel.shape
        if groups > 1 and kh == kw == 1 and cin_g > 1 and stride == (1, 1):
            cg_o = cout // groups
            parts = [
                jax.lax.conv_general_dilated(
                    xx[..., g * cin_g:(g + 1) * cin_g],
                    kernel[:, :, :, g * cg_o:(g + 1) * cg_o].astype(xx.dtype),
                    (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                for g in range(groups)
            ]
            return jnp.concatenate(parts, axis=-1)
        return orig(xx, kernel, stride=stride, dilation=dilation,
                    groups=groups, padding=padding)

    def timed(fn, *a, iters=20):
        out = fn(*a)
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        device_sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    def stage(t):
        for blk, v in zip(blocks, vs):
            t = blk.apply(v, t, train=False)
        return t

    f_dense = jax.jit(stage)
    want = np.asarray(f_dense(x), np.float32)
    t_dense = timed(f_dense, x)

    gc.grouped_conv2d = sliced_1x1
    import mspl_tpu.layers.conv_blocks as cb
    had = getattr(cb, "grouped_conv2d", None)
    if had is not None:
        cb.grouped_conv2d = sliced_1x1
    try:
        f_slice = jax.jit(stage)
        got = np.asarray(f_slice(x), np.float32)
        t_slice = timed(f_slice, x)
    finally:
        gc.grouped_conv2d = orig
        if had is not None:
            cb.grouped_conv2d = had
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"{which}: dense {t_dense:.2f} ms  slice-dots {t_slice:.2f} ms "
          f"(rel err {err:.0e})")


if __name__ == "__main__":
    for w in (sys.argv[1:] or ["stage4", "stage3"]):
        main(w)
