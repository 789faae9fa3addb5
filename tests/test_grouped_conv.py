"""Grouped/depthwise conv rewrite (mspl_tpu/ops/grouped_conv.py) must be the
same convolution `lax.conv_general_dilated` computes — it exists purely
because XLA's feature_group_count path is slow on TPU (module header has the
measurements)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.ops.grouped_conv import depthwise_conv3x3, grouped_conv2d


def _lax_ref(x, k, stride, dilation, groups, padding=None):
    kh, kw = k.shape[0], k.shape[1]
    pad = padding if padding is not None else (
        dilation[0] * (kh - 1) // 2, dilation[1] * (kw - 1) // 2)
    return jax.lax.conv_general_dilated(
        x, k, stride, [(pad[0], pad[0]), (pad[1], pad[1])],
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (cin, cout, groups, k, stride, dilation)
    (16, 8, 4, 1, 1, 1),      # grouped pointwise reduce
    (16, 16, 4, 1, 1, 1),     # grouped pointwise expand
    (12, 12, 12, 3, 1, 1),    # depthwise 3x3
    (12, 12, 12, 3, 1, 4),    # dilated depthwise
    (12, 12, 12, 3, 2, 2),    # strided dilated depthwise (DownSampler branch)
    (20, 4, 4, 3, 1, 1),      # pyramid-pool merge (5->1 per group)
    (16, 12, 4, 3, 2, 1),     # grouped strided 3x3
]


@pytest.mark.parametrize("cin,cout,groups,k,stride,dilation", CASES)
def test_matches_lax_conv(cin, cout, groups, k, stride, dilation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 17, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, cin // groups, cout) * 0.3, jnp.float32)
    got = grouped_conv2d(x, w, stride=(stride, stride),
                         dilation=(dilation, dilation), groups=groups)
    want = _lax_ref(x, w, (stride, stride), (dilation, dilation), groups)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_depthwise3x3_wrapper_matches():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 11, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 1, 8) * 0.3, jnp.float32)
    got = depthwise_conv3x3(x, w, stride=2, dilation=2)
    want = _lax_ref(x, w, (2, 2), (2, 2), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_c_module_param_tree_unchanged():
    """C(groups>1) must keep the nn.Conv-style 'Conv_0/kernel' leaf so
    checkpoints and oracle tests see an identical variable tree."""
    from mspl_tpu.layers.conv_blocks import C

    mod = C(features=8, kernel_size=3, groups=4)
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 8)))
    assert set(v["params"].keys()) == {"Conv_0"}
    assert v["params"]["Conv_0"]["kernel"].shape == (3, 3, 2, 8)


def test_c_module_grouped_matches_dense_semantics():
    """C with groups>1 equals lax grouped conv with the same kernel."""
    from mspl_tpu.layers.conv_blocks import C

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 9, 8), jnp.float32)
    mod = C(features=8, kernel_size=3, groups=8)
    v = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(v, x)
    want = _lax_ref(x, v["params"]["Conv_0"]["kernel"], (1, 1), (1, 1), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dw_shift_grads_match_lax():
    """The small-channel depthwise route (ops/dw_shift.py, custom VJP) must
    match lax's conv AND its autodiff gradients (both dx and dkernel)."""
    from mspl_tpu.ops.dw_shift import dw3x3_shift

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 9, 14, 24), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 1, 24) * 0.3, jnp.float32)
    r = jnp.asarray(rng.randn(2, 9, 14, 24), jnp.float32)

    def loss_shift(x, w):
        return jnp.sum(dw3x3_shift(x, w) * r)

    def loss_lax(x, w):
        return jnp.sum(_lax_ref(x, w, (1, 1), (1, 1), 24) * r)

    (v1, (dx1, dw1)) = jax.value_and_grad(loss_shift, argnums=(0, 1))(x, w)
    (v2, (dx2, dw2)) = jax.value_and_grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                               rtol=1e-4, atol=1e-4)


def test_conv_tapdot_grads_match_lax():
    """The small-channel dense-3x3 route (ops/conv_tapdot.py, custom VJP)
    must match lax's conv AND its autodiff gradients (dx and dkernel)."""
    from mspl_tpu.ops.conv_tapdot import conv3x3_tapdot

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 9, 14, 12), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 12, 10) * 0.2, jnp.float32)
    r = jnp.asarray(rng.randn(2, 9, 14, 10), jnp.float32)

    def loss_tap(x, w):
        return jnp.sum(conv3x3_tapdot(x, w) * r)

    def loss_lax(x, w):
        return jnp.sum(_lax_ref(x, w, (1, 1), (1, 1), 1) * r)

    (v1, (dx1, dw1)) = jax.value_and_grad(loss_tap, argnums=(0, 1))(x, w)
    (v2, (dx2, dw2)) = jax.value_and_grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                               rtol=1e-4, atol=1e-4)


def test_grouped_conv_tapdot_route_matches_native():
    """grouped_conv2d with the tap-dot route forced ON must equal the
    native lowering for dense AND densified-grouped 3x3 shapes."""
    import mspl_tpu.ops.grouped_conv as gc

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 9, 14, 12), jnp.float32)
    wd = jnp.asarray(rng.randn(3, 3, 12, 10) * 0.2, jnp.float32)
    wg = jnp.asarray(rng.randn(3, 3, 3, 8) * 0.2, jnp.float32)  # G=4
    old = gc.TAPDOT_MAX_C
    try:
        gc.TAPDOT_MAX_C = 0
        want_d = gc.grouped_conv2d(x, wd, groups=1)
        want_g = gc.grouped_conv2d(x, wg, groups=4)
        gc.TAPDOT_MAX_C = 48
        got_d = gc.grouped_conv2d(x, wd, groups=1)
        got_g = gc.grouped_conv2d(x, wg, groups=4)
    finally:
        gc.TAPDOT_MAX_C = old
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-5, atol=1e-5)
