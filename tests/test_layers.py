"""L1 layer parity vs the torch-CPU oracle at fp32 (SURVEY.md §7 stage 2 gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import freeze

from mspl_tpu.layers.conv_blocks import CBR, PReLU, C
from mspl_tpu.layers.eesp import EESP, DownSampler, branch_dilations

from tests import torch_oracle as oracle


def test_branch_dilations():
    # k=4: r_lim 13 -> ksizes 3,5,7,9 -> d 1,2,3,4; r_lim 7 -> 3,3,5,7 -> 1,1,2,3
    assert branch_dilations(4, 13) == (1, 2, 3, 4)
    assert branch_dilations(4, 7) == (1, 1, 2, 3)
    assert branch_dilations(4, 5) == (1, 1, 1, 2)


def test_prelu_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 6, 4)).astype(np.float32)
    alpha = rng.uniform(0.1, 0.5, size=(4,)).astype(np.float32)
    m = PReLU(4)
    out = m.apply({"params": {"alpha": jnp.asarray(alpha)}}, jnp.asarray(x))
    ref = oracle.prelu_nhwc(x, alpha)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stride,dilation,groups", [(1, 1, 1), (2, 1, 1), (1, 2, 4), (1, 4, 8), (2, 3, 8)])
def test_conv_matches_torch(stride, dilation, groups):
    rng = np.random.default_rng(1)
    cin, cout = 8, 8
    x = rng.normal(size=(2, 17, 19, cin)).astype(np.float32)
    m = C(cout, kernel_size=3, stride=stride, dilation=dilation, groups=groups)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["Conv_0"]["kernel"])
    out = m.apply(variables, jnp.asarray(x))
    ref = oracle.conv2d_nhwc(x, w, stride=stride, dilation=dilation, groups=groups)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_cbr_eval_matches_torch_composition():
    rng = np.random.default_rng(2)
    cin, cout = 6, 12
    x = rng.normal(size=(1, 9, 11, cin)).astype(np.float32)
    m = CBR(cout, kernel_size=3, stride=1)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    # plant nontrivial BN stats / params
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = {
        "mean": rng.normal(size=(cout,)).astype(np.float32) * 0.1,
        "var": rng.uniform(0.5, 2.0, size=(cout,)).astype(np.float32),
    }
    variables = {
        "params": variables["params"],
        "batch_stats": {
            "CB_0": {"BatchNorm_0": {"mean": jnp.asarray(stats["mean"]),
                                      "var": jnp.asarray(stats["var"])}}
        },
    }
    out = m.apply(variables, jnp.asarray(x), train=False)

    w = np.asarray(params["CB_0"]["C_0"]["Conv_0"]["kernel"])
    scale = np.asarray(params["CB_0"]["BatchNorm_0"]["scale"])
    bias = np.asarray(params["CB_0"]["BatchNorm_0"]["bias"])
    alpha = np.asarray(params["PReLU_0"]["alpha"])
    ref = oracle.conv2d_nhwc(x, w)
    ref = oracle.batchnorm_nhwc(ref, stats["mean"], stats["var"], scale, bias)
    ref = oracle.prelu_nhwc(ref, alpha)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_eesp_shapes_and_residual():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    m = EESP(32, stride=1, k=4, r_lim=9)
    variables = m.init(jax.random.PRNGKey(2), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 16, 16, 32)

    m2 = EESP(64, stride=2, k=4, r_lim=9, down_method="avg")
    v2 = m2.init(jax.random.PRNGKey(3), x, train=False)
    out2 = m2.apply(v2, x, train=False)
    assert out2.shape == (2, 8, 8, 64)


def test_downsampler_shapes_with_reinforcement():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 32)).astype(np.float32))
    m = DownSampler(64, k=4, r_lim=13, reinf=True)
    variables = m.init(jax.random.PRNGKey(4), x, img, train=False)
    out = m.apply(variables, x, img, train=False)
    assert out.shape == (2, 16, 16, 64)


def test_avgpool_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 15, 17, 6)).astype(np.float32)
    from mspl_tpu.layers.eesp import _avg_pool_3x3_s2

    ours = np.asarray(_avg_pool_3x3_s2(jnp.asarray(x)))
    ref = oracle.avgpool_3x3_s2(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
