"""Measure the model-parallel generation epilogue (VERDICT r2 item 6).

Under model-axis parallelism, `generate_pseudo_labels` drops the fused
channel-major Pallas pass: each device runs only its own sources' forwards
and a plain-XLA epilogue (softmax -> convert inside the branch; after the
psum: argmax/conf/kc on the fused [B, H, W, T+1] distribution).  The r2
code asserted this is cheap without measuring.  This tool times, on one
chip at the bench shape:

  1. branch-partial:  softmax + label-space convert for ONE source's logits
                      (the per-device extra work vs serial, x sources/slice)
  2. epilogue-xla:    argmax + conf + kc threshold on the fused f32
                      [B, H, W, T+1] map (runs once per device, post-psum)
  3. pass-cm-fused:   the full 3-model fused channel-major Pallas pass
                      (what the model=1 path uses), for scale
  4. pass-jnp:        the full 3-model jnp pass (fused_pseudo_pass)

Run:  python tools/bench_epilogue.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 128
HW = (256, 480)
T = 3


def _sync(x):
    from mspl_tpu.utils.profiling import device_sync

    device_sync(x)


def _time(fn, *args, iters=12, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.pseudo.generate import (
        _apply_kc,
        _soft_epilogue,
        convert_probs,
        fused_pseudo_pass,
    )

    rng = jax.random.PRNGKey(0)
    h, w = HW
    specs = (("camvid", 11), ("cityscapes", 19), ("forest", 5))
    logits = [
        jax.device_put(jax.random.normal(
            jax.random.fold_in(rng, i), (BATCH, h, w, c), jnp.bfloat16) * 3)
        for i, (_, c) in enumerate(specs)
    ]
    logits_cm = [jax.device_put(jnp.transpose(l, (0, 3, 1, 2)))
                 for l in logits]
    mats = [label_conversion_matrix(n) for n, _ in specs]
    kc = jnp.asarray(np.full(T, 0.5, np.float32))

    @jax.jit
    def branch_partial(lg):
        p = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
        return convert_probs(p, mats[0])

    acc = jax.device_put(branch_partial(logits[0]) * 3.0)  # fused-sum stand-in

    @jax.jit
    def epilogue_xla(total):
        label, conf = _soft_epilogue(total / 3.0, T, "prob", 255)
        return _apply_kc(label, conf, kc, T, 255)

    @jax.jit
    def pass_jnp(ls):
        return fused_pseudo_pass(ls, mats, mode="soft", kc=kc)

    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_cm

    @jax.jit
    def pass_cm(ls):
        return fused_pseudo_cm(ls, mats, kc=kc, mode="soft")

    t_branch = _time(branch_partial, logits[0])
    t_epi = _time(epilogue_xla, acc)
    t_jnp = _time(pass_jnp, logits)
    t_cm = _time(pass_cm, logits_cm)

    img_ms = BATCH
    print(f"batch {BATCH} @ {h}x{w}, T={T} (ms/batch):")
    print(f"  branch-partial (1 source softmax+convert, XLA): {t_branch:.2f}")
    print(f"  epilogue-xla (argmax/conf/kc on fused [B,H,W,{T + 1}]): "
          f"{t_epi:.2f}")
    print(f"  full 3-model pass, jnp:          {t_jnp:.2f}")
    print(f"  full 3-model pass, cm kernel:    {t_cm:.2f}")
    print(f"  model-axis per-device epilogue cost ~= branch-partial*"
          f"(sources/slice) + epilogue-xla")
    print(f"  (for context: 1 batch at 1441 img/s = "
          f"{img_ms / 1441 * 1000:.1f} ms)")


if __name__ == "__main__":
    main()
