"""Micro-A/B: XLA autodiff backward of BN(train)+PReLU vs an MXU-contraction
formulation of the per-channel grads, at the decoder's lane-starved shapes.

Hypothesis (r3 train trace): the ~20 ms %convert_reduce_fusion block is the
CBR backwards — each emits (dscale, dbias, dalpha) per-channel reduces over
[64,128,240,C] at C=24-40 (lanes 24-40/128 occupied -> the VPU reduce runs
at ~1/4 throughput) fused with the dx pass.  A dot_general ones-contraction
([1, M] @ [M, C]) rides the MXU at memory bandwidth regardless of lane
occupancy.

Run: python tools/exp_bn_bwd.py
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
    device_sync(jax_tree_first(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(jax_tree_first(out))
    return (time.perf_counter() - t0) / iters * 1e3


def jax_tree_first(t):
    import jax

    return jax.tree_util.tree_leaves(t)[0]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    B, H, W = 64, 128, 240
    eps = 1e-5

    for C in (24, 32, 40):
        rng = np.random.default_rng(C)
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        alpha = jnp.asarray(abs(rng.normal(size=(C,))) * 0.2, jnp.float32)

        def bn_prelu(x, scale, bias, alpha):
            xf = x.astype(jnp.float32)
            m = xf.mean(axis=(0, 1, 2))
            v = xf.var(axis=(0, 1, 2))
            y = (xf - m) * jax.lax.rsqrt(v + eps) * scale + bias
            y = jnp.maximum(y, 0) + alpha * jnp.minimum(y, 0)
            return y.astype(x.dtype)

        def loss(x, scale, bias, alpha):
            return jnp.sum(bn_prelu(x, scale, bias, alpha) * g)

        grad_xla = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

        # MXU formulation of JUST the per-channel reduce parts, with the
        # same operands the real backward touches (reads x-hat and g):
        M = B * H * W

        @jax.jit
        def chan_grads_dot2(x, g):
            # cleaner: one [2C] contraction — stack (g, g*xhat) in lanes
            xf = x.astype(jnp.float32)
            m = xf.mean(axis=(0, 1, 2))
            v = xf.var(axis=(0, 1, 2))
            xhat = ((xf - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)
            g2 = g.reshape(M, -1)
            both = jnp.concatenate([g2, g2 * xhat.reshape(M, -1)], axis=1)
            ones = jnp.ones((1, M), jnp.bfloat16)
            out = jax.lax.dot_general(
                ones, both, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0]
            return out[:x.shape[-1]], out[x.shape[-1]:]

        t_xla = timed(grad_xla, x, scale, bias, alpha)
        t_dot = timed(chan_grads_dot2, x, g)
        print(f"C={C}: XLA full bwd {t_xla:.2f} ms | dot chan-grads "
              f"(incl stats fwd) {t_dot:.2f} ms")


if __name__ == "__main__":
    main()
