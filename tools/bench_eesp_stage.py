"""Isolated A/B timing: fused EESP-stage Pallas kernel vs the per-unit lax
path, at the production bench shapes (ESPNetv2 s=2.0, batch 128, 256x480
input -> stage3: 3 units C=256 @32x60, stage4: 7 units C=512 @16x30).

Usage: python tools/bench_eesp_stage.py [stage3|stage4 ...]
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


def _randomize_stats(v, rng):
    import jax.numpy as jnp

    def walk(tree):
        out = {}
        for k, sub in tree.items():
            if k == "mean":
                out[k] = jnp.asarray(rng.randn(*sub.shape) * 0.3, sub.dtype)
            elif k == "var":
                out[k] = jnp.asarray(
                    0.5 + rng.rand(*sub.shape).astype(np.float32))
            else:
                out[k] = walk(sub)
        return out
    return {"params": v["params"], "batch_stats": walk(v["batch_stats"])}


def bench_stage(name, n_units, c, hw, k, r_lim, batch=128, bbs=(1, 2)):
    import jax
    import jax.numpy as jnp

    from mspl_tpu.layers.eesp import EESP, branch_dilations
    from mspl_tpu.ops.pallas_eesp_stage import (eesp_block_params,
                                                eesp_stage_fused_eval)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, *hw, c) * 0.5, jnp.bfloat16)
    blocks = [EESP(c, stride=1, k=k, r_lim=r_lim) for _ in range(n_units)]
    vs = []
    y = x
    for i, blk in enumerate(blocks):
        v = blk.init(jax.random.PRNGKey(i), y, train=False)
        v = _randomize_stats(v, rng)
        vs.append(v)
        y = blk.apply(v, y, train=False)

    @jax.jit
    def lax_stage(t):
        for blk, v in zip(blocks, vs):
            t = blk.apply(v, t, train=False)
        return t

    params = [eesp_block_params(v["params"], v["batch_stats"], k)
              for v in vs]
    dils = branch_dilations(k, r_lim)

    want = np.asarray(lax_stage(x), np.float32)
    t_lax = timed(lax_stage, x)
    line = f"{name}: lax {t_lax:.2f} ms"
    for bb in bbs:
        if batch % bb:
            continue
        fused = jax.jit(lambda t, bb=bb: eesp_stage_fused_eval(
            t, params, dils, images_per_step=bb))
        try:
            got = np.asarray(fused(x), np.float32)
        except Exception as e:
            line += f"  bb{bb} FAIL({type(e).__name__})"
            continue
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        t_fused = timed(fused, x)
        line += f"  bb{bb} {t_fused:.2f} ms (err {err:.0e})"
    print(line)


STAGES = {
    "stage3": dict(n_units=3, c=256, hw=(32, 60), k=4, r_lim=9, bbs=(1,)),
    "stage4": dict(n_units=7, c=512, hw=(16, 30), k=4, r_lim=7, bbs=(1, 2, 4)),
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(STAGES)
    for nm in which:
        bench_stage(nm, **STAGES[nm])
