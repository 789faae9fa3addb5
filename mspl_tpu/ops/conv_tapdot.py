"""Dense 3x3 (stride 1) conv as 9 shifted matmuls — the small-channel
decoder form, with a hand-written VJP.

Motivation (r3 train trace, tools/tpu_profile.py --what train --raw, batch
64): the decoder's dense/densified 3x3 convs at 24-40 channels make XLA
batch-minor their operands ({3,1,2,0} <-> {0,3,2,1} copies of
[64,128,240,32] at ~1.3-1.6 ms each, ~14 ms/step total) and their weight
grads lower as per-channel convert+reduce scans over lane-starved arrays
(part of the ~20 ms %convert_reduce_fusion block).  Writing the conv as

    out[b,y,x,o] = sum_{ky,kx} xp[b, y+ky, x+kx, :] @ W[ky, kx]      (MXU)

keeps the native C-minor layout end to end (a [M, Cin] x [Cin, Cout] dot
never changes layout) and turns the weight grad into 9 MXU contractions

    dW[ky,kx] = xp_window(ky,kx)^T @ g   (contract b,h,w)

instead of reduce scans.  The data grad is the mirrored tap-dot with the
spatially-flipped kernel transposed.  Tap accumulation is f32 (MXU
accumulator), matching the native conv path.

Routed from ops/grouped_conv.py for 3x3/s1/d1 convs with
max(Cin, Cout) <= TAPDOT_MAX_C (see the threshold comment there); the
encoder's wide convs keep XLA's native conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tap_dot_sum(xp: jnp.ndarray, w33: jnp.ndarray, h: int, wd: int
                 ) -> jnp.ndarray:
    """xp: [B, H+2, W+2, Ci] padded; w33: [3, 3, Ci, Co].
    Returns [B, H, W, Co] in xp's dtype; per-tap dots accumulate f32."""
    acc = None
    for ky in range(3):
        for kx in range(3):
            t = jax.lax.dot_general(
                xp[:, ky:ky + h, kx:kx + wd, :], w33[ky, kx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(xp.dtype)


@jax.custom_vjp
def conv3x3_tapdot(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Dense 3x3, stride 1, 'same' zero padding; kernel [3, 3, Ci, Co]."""
    b, h, wd, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return _tap_dot_sum(xp, kernel.astype(x.dtype), h, wd)


def _fwd(x, kernel):
    return conv3x3_tapdot(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    b, h, wd, ci = x.shape
    w = kernel.astype(g.dtype)
    # data grad: dx[b,y,x,i] = sum_{ky,kx,o} g[b, y+1-ky, x+1-kx, o]
    #   * W[ky,kx,i,o] — the tap-dot of the padded cotangent with the
    #   180-degree-flipped kernel, Cin/Cout transposed
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wr = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))      # [3,3,Co,Ci]
    dx = _tap_dot_sum(gp, wr, h, wd).astype(x.dtype)
    # weight grad: dW[ky,kx,i,o] = sum_{b,y,x} xp[b,y+ky,x+kx,i] g[b,y,x,o]
    # — 9 MXU contractions over (b, h, w); f32 accumulation
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(g.dtype)
    taps = [
        jax.lax.dot_general(
            xp[:, ky:ky + h, kx:kx + wd, :], g,
            (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32)
        for ky in range(3) for kx in range(3)
    ]
    dk = jnp.stack(taps).reshape(3, 3, ci, g.shape[-1]).astype(kernel.dtype)
    return dx, dk


conv3x3_tapdot.defvjp(_fwd, _bwd)
