"""int8 quantized-inference probe (VERDICT r4 item 2, phase A).

Before building a full int8 eval path for the three source forwards,
measure the quantized BUILDING BLOCKS in isolation at the production
shapes (ESPNetv2 s=2.0, batch 128 @ 256x480 — the bench workload), on the
real chip:

  * stem conv 3x3/s2            3->32   @ 256x480   (MXU, high-res)
  * grouped 1x1 conv  g=4       256->256 @ 32x60    (EESP proj/expand, MXU)
  * dense 1x1 conv              256->256 @ 32x60    (MXU reference)
  * depthwise 3x3 conv d=2      256 ch  @ 32x60     (EESP branch, VPU)
  * requantize chain            round/clip/cast on the stage tensor
  * composite EESP-ish block: grouped1x1 -> dw3x3 -> grouped1x1 with
    dequant->PReLU->requant between, int8 vs the bf16 original

Each op: bf16 baseline vs int8 (int8 x int8 -> int32 accumulation via
preferred_element_type, then scale).  v5e MXU int8 peak is 2x bf16; the
depthwise/VPU ops and the added requant elementwise work are where int8
can LOSE.  If the composite block does not beat bf16 here, the full
integration cannot win and the result is recorded as a negative
(BASELINE.md r5).

Run: python tools/exp_int8_probe.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.monotonic()


def hb(msg):
    print(f"[int8 +{time.monotonic() - T0:.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main(batch=128):
    hb("importing jax")
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mspl_tpu.utils.profiling import device_sync

    t = time.perf_counter()
    float(jnp.ones((128, 128)).sum())
    hb(f"first contact {time.perf_counter() - t:.1f}s")

    rng = np.random.default_rng(0)

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        device_sync(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    def conv(x, w, stride=1, dilation=1, groups=1, prefer=None):
        return lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding="SAME",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=prefer)

    results = {}

    def ab(name, mk_bf16, mk_int8):
        b = timeit(jax.jit(mk_bf16[0]), *mk_bf16[1])
        i = timeit(jax.jit(mk_int8[0]), *mk_int8[1])
        results[name] = {"bf16_ms": round(b, 3), "int8_ms": round(i, 3),
                         "speedup": round(b / i, 2)}
        hb(f"{name}: bf16 {b:.3f} ms vs int8 {i:.3f} ms "
           f"({b / i:.2f}x)")

    def rand_bf16(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    def rand_i8(shape):
        return jnp.asarray(rng.integers(-127, 127, size=shape), jnp.int8)

    # 1. stem conv 3x3/s2 3->32 @ 256x480
    x = rand_bf16((batch, 256, 480, 3))
    w = rand_bf16((3, 3, 3, 32))
    xq, wq = rand_i8((batch, 256, 480, 3)), rand_i8((3, 3, 3, 32))
    sc = jnp.float32(0.01)
    ab("stem_3x3_s2_3to32_256x480",
       (lambda a, b: conv(a, b, stride=2), (x, w)),
       (lambda a, b: (conv(a, b, stride=2, prefer=jnp.int32)
                      .astype(jnp.float32) * sc).astype(jnp.bfloat16),
        (xq, wq)))

    # 2. grouped 1x1 g=4 256->256 @ 32x60
    x = rand_bf16((batch, 32, 60, 256))
    w = rand_bf16((1, 1, 64, 256))
    xq, wq = rand_i8((batch, 32, 60, 256)), rand_i8((1, 1, 64, 256))
    ab("grouped1x1_g4_256_32x60",
       (lambda a, b: conv(a, b, groups=4), (x, w)),
       (lambda a, b: (conv(a, b, groups=4, prefer=jnp.int32)
                      .astype(jnp.float32) * sc).astype(jnp.bfloat16),
        (xq, wq)))

    # 3. dense 1x1 256->256 @ 32x60
    w = rand_bf16((1, 1, 256, 256))
    wq = rand_i8((1, 1, 256, 256))
    ab("dense1x1_256_32x60",
       (lambda a, b: conv(a, b), (x, w)),
       (lambda a, b: (conv(a, b, prefer=jnp.int32)
                      .astype(jnp.float32) * sc).astype(jnp.bfloat16),
        (xq, wq)))

    # 4. depthwise 3x3 d=2 C=256 @ 32x60
    w = rand_bf16((3, 3, 1, 256))
    wq = rand_i8((3, 3, 1, 256))
    ab("dw3x3_d2_256_32x60",
       (lambda a, b: conv(a, b, dilation=2, groups=256), (x, w)),
       (lambda a, b: (conv(a, b, dilation=2, groups=256, prefer=jnp.int32)
                      .astype(jnp.float32) * sc).astype(jnp.bfloat16),
        (xq, wq)))

    # 5. requantize chain alone on the stage tensor (the PER-LAYER tax):
    #    f32 -> scale -> round -> clip -> int8
    y = jnp.asarray(rng.standard_normal((batch, 32, 60, 256)), jnp.float32)

    def requant(v):
        return jnp.clip(jnp.round(v * 12.7), -127, 127).astype(jnp.int8)

    r = timeit(jax.jit(requant), y)
    results["requant_f32toi8_32x60x256"] = {"ms": round(r, 3)}
    hb(f"requant chain: {r:.3f} ms")

    # 6. composite EESP-ish block at stage-3 shape: proj g1x1 (256->64) ->
    #    4 parallel dw3x3 (d=1,2,4,8) + HFF -> expand g1x1 (256->256 on
    #    concat), PReLU between.  bf16 original vs int8-everywhere with
    #    dequant->PReLU->requant at each boundary.
    C, Cp = 256, 64
    xb = rand_bf16((batch, 32, 60, C))
    wp = rand_bf16((1, 1, C // 4, Cp))
    wds = [rand_bf16((3, 3, 1, Cp)) for _ in range(4)]
    we = rand_bf16((1, 1, Cp, C))
    alpha = jnp.float32(0.25)

    def prelu(v):
        return jnp.where(v >= 0, v,
                         (alpha * v.astype(jnp.float32)).astype(v.dtype))

    def block_bf16(a, wp, wds, we):
        p = prelu(conv(a, wp, groups=4))
        outs = []
        accum = None
        for d, wd in zip((1, 2, 4, 8), wds):
            o = conv(p, wd, dilation=d, groups=Cp)
            accum = o if accum is None else accum + o
            outs.append(accum)
        cat = jnp.concatenate(outs, axis=-1)
        return prelu(conv(cat, we, groups=4))

    xbq = rand_i8((batch, 32, 60, C))
    wpq = rand_i8((1, 1, C // 4, Cp))
    wdsq = [rand_i8((3, 3, 1, Cp)) for _ in range(4)]
    weq = rand_i8((1, 1, Cp, C))

    def block_int8(a, wp, wds, we):
        p32 = conv(a, wp, groups=4, prefer=jnp.int32)
        p = requant(prelu(p32.astype(jnp.float32) * sc))
        outs = []
        accum = None
        for d, wd in zip((1, 2, 4, 8), wds):
            o = conv(p, wd, dilation=d, groups=Cp, prefer=jnp.int32)
            accum = o if accum is None else accum + o
            outs.append(accum)
        cat = jnp.concatenate(outs, axis=-1)
        catq = requant(cat.astype(jnp.float32) * sc)
        e32 = conv(catq, we, groups=4, prefer=jnp.int32)
        return prelu(e32.astype(jnp.float32) * sc).astype(jnp.bfloat16)

    ab("eesp_block_stage3",
       (block_bf16, (xb, wp, wds, we)),
       (block_int8, (xbq, wpq, wdsq, weq)))

    print(json.dumps({"metric": "int8_probe", "batch": batch,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
