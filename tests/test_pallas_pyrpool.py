"""Fused pyramid-pool branch kernel (mspl_tpu/ops/pallas_pyrpool.py) must
match the jnp branch stack (adaptive-avg / bilinear resample + depthwise 3x3
+ resample back, mspl_tpu/layers/pyramid_pool.py) — run in interpret mode on
the CPU test backend."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.ops.grouped_conv import depthwise_conv3x3
from mspl_tpu.ops.pallas_pyrpool import pyr_branches_pallas
from mspl_tpu.ops.resize import adaptive_avg_pool, resize_bilinear

SCALES = (2.0, 1.5, 1.0, 0.5, 0.1)


def _jnp_branches(x, weights, scales):
    b, h, w, p = x.shape
    branches = []
    for i, s in enumerate(scales):
        hs = max(int(math.ceil(h * s)), 5)
        ws = max(int(math.ceil(w * s)), 5)
        if s < 1.0:
            y = adaptive_avg_pool(x, (hs, ws))
        elif s > 1.0:
            y = resize_bilinear(x, (hs, ws), align_corners=True)
        else:
            y = x
        y = depthwise_conv3x3(y, weights[i][:, :, None, :])
        if s != 1.0:
            y = resize_bilinear(y, (h, w), align_corners=True)
        branches.append(y)
    return jnp.concatenate(branches, axis=-1)


@pytest.mark.parametrize("hw,p", [((16, 30), 9), ((13, 17), 8)])
def test_pyr_kernel_matches_jnp(hw, p):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw, p), jnp.float32)
    w = jnp.asarray(rng.randn(len(SCALES), 3, 3, p) * 0.3, jnp.float32)
    got = pyr_branches_pallas(x, w, SCALES, interpret=True)
    want = _jnp_branches(x, w, SCALES)
    assert got.shape == want.shape == (2, *hw, len(SCALES) * p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_branch_kernel_grad_matches_jnp():
    """custom-VJP backward (jnp-reference VJP) == grad of the jnp stack."""
    from mspl_tpu.ops.pallas_pyrpool import pyr_branches_jnp, pyr_branches_pallas

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 10, 12, 6), jnp.float32)
    w = jnp.asarray(rng.randn(len(SCALES), 3, 3, 6) * 0.3, jnp.float32)

    def loss_k(x, w):
        return jnp.sum(pyr_branches_pallas(x, w, SCALES) ** 2)

    def loss_j(x, w):
        return jnp.sum(pyr_branches_jnp(x, w, SCALES) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gj = jax.grad(loss_j, argnums=(0, 1))(x, w)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pyrpool_module_paths_agree():
    """EfficientPyrPool(use_pallas=True/False) share parameters and agree."""
    from mspl_tpu.layers.pyramid_pool import EfficientPyrPool

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 20, 12), jnp.float32)
    mod_a = EfficientPyrPool(8, 16, use_pallas=False)
    mod_b = EfficientPyrPool(8, 16, use_pallas=True)
    v = mod_a.init(jax.random.PRNGKey(0), x, train=False)
    a = mod_a.apply(v, x, train=False)
    b = mod_b.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
