"""The fused eval-mode pyramid-pool kernel (pyr_pool_fused_eval) must match
the module's jnp path: BN running-stat affines + PReLU + shuffle + grouped
merge + classifier + optional last BR, end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.layers.pyramid_pool import EfficientPyrPool


def _randomize_stats(v, rng):
    """Random running stats so BN-affine folding is actually exercised."""
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


def test_fused_eval_v2_matches_v1():
    """Channel-group-stacked v2 kernel == per-channel v1 kernel (both
    interpret on CPU), covering odd branch heights handled by zero-padded
    slot matrices (the 0.1 scale), multi-group classifier accumulation
    (p=6 -> 2 groups of 3), and the H % 8 != 0 whole-kernel fallback."""
    from mspl_tpu.ops.pallas_pyrpool import (pyr_pool_fused_eval,
                                             pyr_pool_fused_eval_v2)

    rng = np.random.RandomState(1)
    scales = (2.0, 1.5, 1.0, 0.5, 0.1)
    o = 5
    for p, (h, w) in ((3, (16, 24)), (6, (16, 24)), (3, (12, 20))):
        x = jnp.asarray(rng.randn(2, h, w, p), jnp.float32)
        dw_w = jnp.asarray(rng.randn(5, 3, 3, p) * 0.3, jnp.float32)
        aff1 = jnp.asarray(rng.randn(3, 5 * p) * 0.2 + 0.6, jnp.float32)
        mw = jnp.asarray(rng.randn(3, 3, 5, p) * 0.3, jnp.float32)
        aff2 = jnp.asarray(rng.randn(3, p) * 0.2 + 0.6, jnp.float32)
        cls_w = jnp.asarray(rng.randn(p, o) * 0.3, jnp.float32)
        cls_b = jnp.asarray(rng.randn(o) * 0.1, jnp.float32)
        aff3 = jnp.stack([jnp.ones((o,)), jnp.zeros((o,)), jnp.ones((o,))])
        args = (x, dw_w, aff1, mw, aff2, cls_w, cls_b, aff3, scales)
        want = pyr_pool_fused_eval(*args, interpret=True)
        got = pyr_pool_fused_eval_v2(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("last_br", [True, False])
def test_fused_eval_matches_jnp(last_br):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 20, 12), jnp.float32)
    mod_ref = EfficientPyrPool(8, 16, last_layer_br=last_br, use_pallas=False)
    mod_fused = EfficientPyrPool(8, 16, last_layer_br=last_br, use_pallas=True,
                                 fuse_tail=True)
    v = mod_ref.init(jax.random.PRNGKey(0), x, train=False)
    v = _randomize_stats(v, rng)
    want = mod_ref.apply(v, x, train=False)
    got = mod_fused.apply(v, x, train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
