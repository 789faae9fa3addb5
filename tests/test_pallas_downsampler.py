"""Fused DownSampler front (ops/pallas_downsampler.py) vs the lax path:
strided dilated depthwise branches + HFF concat and the 3x3/s2 avg pool."""

import jax
import jax.numpy as jnp
import numpy as np

from mspl_tpu.ops.pallas_downsampler import (
    _jnp_reference,
    down_front_pallas,
)

DILS = (1, 2, 4, 8)


def test_down_front_matches_lax():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, 36, 6), jnp.float32)
    proj = jnp.asarray(rng.randn(2, 24, 36, 5), jnp.float32)
    w = jnp.asarray(rng.randn(len(DILS), 3, 3, 5) * 0.3, jnp.float32)
    pool_k, br_k = down_front_pallas(x, proj, w, DILS, interpret=True)
    pool_r, br_r = _jnp_reference(x, proj, w, DILS)
    np.testing.assert_allclose(np.asarray(pool_k), np.asarray(pool_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(br_k), np.asarray(br_r),
                               rtol=1e-5, atol=1e-5)


def test_down_front_odd_sizes():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 13, 21, 4), jnp.float32)
    proj = jnp.asarray(rng.randn(1, 13, 21, 4), jnp.float32)
    w = jnp.asarray(rng.randn(len(DILS), 3, 3, 4) * 0.3, jnp.float32)
    pool_k, br_k = down_front_pallas(x, proj, w, DILS, interpret=True)
    pool_r, br_r = _jnp_reference(x, proj, w, DILS)
    assert pool_k.shape == pool_r.shape and br_k.shape == br_r.shape
    np.testing.assert_allclose(np.asarray(pool_k), np.asarray(pool_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(br_k), np.asarray(br_r),
                               rtol=1e-5, atol=1e-5)


def test_down_front_grad_matches():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 16, 4), jnp.float32)
    proj = jnp.asarray(rng.randn(1, 12, 16, 4), jnp.float32)
    w = jnp.asarray(rng.randn(len(DILS), 3, 3, 4) * 0.3, jnp.float32)

    def loss_k(x, p, w):
        a, b = down_front_pallas(x, p, w, DILS)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)

    def loss_r(x, p, w):
        a, b = _jnp_reference(x, p, w, DILS)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, proj, w)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, proj, w)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
