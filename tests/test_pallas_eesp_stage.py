"""Fused EESP-stage kernel (ops/pallas_eesp_stage.py) must match the
per-unit lax path end-to-end: proj CBR -> K dilated depthwise + HFF -> BR
-> grouped CB expand -> residual -> PReLU, chained over the stage, with BN
folded from running statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.models.espnetv2 import EESPNet


def _randomize_stats(v, rng):
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


@pytest.mark.slow  # default-off experiment kernel (recorded negative
# result, ops/pallas_eesp_stage.py header); the fast tier keeps the
# direct-kernel canary below
@pytest.mark.parametrize("hw", [(16, 24), (16, 16)])  # 16x16: W%8==0 ->
def test_fused_stage_matches_lax(hw):                 # every dilation masked
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw, 3), jnp.float32)
    ref = EESPNet(s=1.0, reinf=True, fuse_stages=False)
    fused = EESPNet(s=1.0, reinf=True, fuse_stages=True)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)
    v = _randomize_stats(v, rng)
    want = ref.apply(v, x, train=False, method=EESPNet.encode)
    got = fused.apply(v, x, train=False, method=EESPNet.encode)
    for w_t, g_t in zip(want, got):
        assert g_t.shape == w_t.shape
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(w_t),
                                   rtol=5e-4, atol=5e-4)


def test_fused_stage_kernel_direct():
    """Direct kernel-vs-lax check on a 2-unit chain with max_blocks=1 so
    the multi-call chaining path is exercised too."""
    from mspl_tpu.layers.eesp import EESP, branch_dilations
    from mspl_tpu.ops.pallas_eesp_stage import (eesp_block_params,
                                                eesp_stage_fused_eval)

    rng = np.random.RandomState(1)
    k, r_lim, c = 4, 9, 16
    x = jnp.asarray(rng.randn(2, 8, 12, c), jnp.float32)
    blocks = [EESP(c, stride=1, k=k, r_lim=r_lim) for _ in range(2)]
    vs = []
    y = x
    for i, blk in enumerate(blocks):
        v = blk.init(jax.random.PRNGKey(i), y, train=False)
        v = _randomize_stats(v, rng)
        vs.append(v)
        y = blk.apply(v, y, train=False)
    params = [eesp_block_params(v["params"], v["batch_stats"], k)
              for v in vs]
    got = eesp_stage_fused_eval(x, params, branch_dilations(k, r_lim),
                                interpret=True, max_blocks=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow  # default-off experiment mode (see above)
@pytest.mark.parametrize("hw", [(32, 80), (16, 24)])
def test_layout_contract_matches_lax(hw):
    """Padded-layout-contract eval (EESPNet.layout_contract: zero-padded
    [B,H,Wp,C] carried from stage3 through stage4, DownSampler valid_w
    masking) must reproduce the unpadded lax encoder exactly.  W=80 gives
    wp3=16/wp4=8 (contract ACTIVE); W=24 gives wp4=4, not 8-aligned,
    exercising the graceful fall-back."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, *hw, 3), jnp.float32)
    ref = EESPNet(s=1.0, reinf=True, fuse_stages=False)
    fused = EESPNet(s=1.0, reinf=True, fuse_stages=True,
                    layout_contract=True)
    v = ref.init(jax.random.PRNGKey(3), x, train=False)
    v = _randomize_stats(v, rng)
    want = ref.apply(v, x, train=False, method=EESPNet.encode)
    got = fused.apply(v, x, train=False, method=EESPNet.encode)
    for w_t, g_t in zip(want, got):
        assert g_t.shape == w_t.shape
        # atol 3e-3 against activations of magnitude ~1e3: the padded form
        # changes XLA fusion shapes, hence f32 accumulation order (observed
        # worst case 9e-4 abs on 2/5120 elements); a real halo bug would
        # corrupt whole boundary columns at activation magnitude
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(w_t),
                                   rtol=5e-4, atol=3e-3)
