"""Isolated TPU timings for the hand-written kernels (A/B harness).

Usage: python tools/bench_kernels.py [pyrpool_tail ...]   (default: all)

Times each op standalone with fetch-synced steady-state iterations
(utils/profiling.device_sync — see BASELINE.md measurement caveat).
Standalone numbers can differ from in-pipeline cost (layout luck); use
tools/tpu_profile.py for in-context numbers.
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


def pyrpool_tail_args(o=11, p=8, b=128, h=128, w=240, seed=0):
    """Bench-shape arguments for the fused classifier-stage tail kernel
    (bu_dec_l4 in the pipeline: [B,128,240,P] -> [B,O,128,240])."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.normal(size=(b, h, w, p)), jnp.bfloat16)
    return dict(
        x=x,
        dw_weights=r(5, 3, 3, p),
        aff1=r(3, 5 * p),
        merge_weights=r(3, 3, 1, 5 * p),
        aff2=r(3, p),
        cls_w=r(p, o),
        cls_b=r(o),
        aff3=r(3, o),
        scales=(2.0, 1.5, 1.0, 0.5, 0.1),
    )


def bench_pyrpool_tail():
    import jax

    from mspl_tpu.ops.pallas_pyrpool import pyr_pool_fused_eval_v2

    for o, p in ((11, 8), (19, 9), (5, 8)):
        a = pyrpool_tail_args(o=o, p=p)
        f = jax.jit(lambda x, a=a: pyr_pool_fused_eval_v2(
            x, a["dw_weights"], a["aff1"], a["merge_weights"], a["aff2"],
            a["cls_w"], a["cls_b"], a["aff3"], a["scales"],
            channel_major_out=True))
        ms = timed(f, a["x"])
        print(f"pyr_pool_fused_eval_v2 o={o} p={p}: {ms:.3f} ms")


BENCHES = {"pyrpool_tail": bench_pyrpool_tail}


def bench_pyrpool_tail_v3():
    """Split-tail v3 vs v2 at the production head shapes, with a
    numerical cross-check."""
    import jax

    from mspl_tpu.ops.pallas_pyrpool import (pyr_pool_fused_eval_v2,
                                             pyr_pool_fused_eval_v3)

    for o, p in ((11, 8), (19, 9), (5, 8)):
        a = pyrpool_tail_args(o=o, p=p)

        def call(fn, x, a=a):
            return fn(x, a["dw_weights"], a["aff1"], a["merge_weights"],
                      a["aff2"], a["cls_w"], a["cls_b"], a["aff3"],
                      a["scales"], channel_major_out=True)

        f2 = jax.jit(lambda x: call(pyr_pool_fused_eval_v2, x))
        f3 = jax.jit(lambda x: call(pyr_pool_fused_eval_v3, x))
        want = np.asarray(f2(a["x"]), np.float32)
        got = np.asarray(f3(a["x"]), np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        ms2 = timed(f2, a["x"])
        ms3 = timed(f3, a["x"])
        print(f"tail o={o} p={p}: v2 {ms2:.3f} ms  v3 {ms3:.3f} ms "
              f"(rel err {err:.0e})")


BENCHES["pyrpool_tail_v3"] = bench_pyrpool_tail_v3

def bench_pyrpool_branches():
    """Branch stack only (no tail) at the bu_dec_l4 shape — isolates the
    branch cost from the merge/classify tail."""
    import jax
    import jax.numpy as jnp

    from mspl_tpu.ops.pallas_pyrpool import _pyr_branches_impl_v2

    rng = np.random.default_rng(0)
    for p in (8, 9):
        x = jnp.asarray(rng.normal(size=(128, 128, 240, p)), jnp.bfloat16)
        wts = jnp.asarray(rng.normal(size=(5, 3, 3, p)).astype(np.float32))
        f = jax.jit(lambda x, w: _pyr_branches_impl_v2(
            x, w, (2.0, 1.5, 1.0, 0.5, 0.1)))
        ms = timed(f, x, wts)
        print(f"pyr_branches_v2 p={p}: {ms:.3f} ms")


BENCHES["pyrpool_branches"] = bench_pyrpool_branches


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    names = sys.argv[1:] or list(BENCHES)
    for n in names:
        BENCHES[n]()


