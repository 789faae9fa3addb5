"""Channel-major train decoder (VERDICT r3 item 4): the [B, C, H, W]
decoder path (`ESPNetv2Segmentation.cm_decoder`, ops/cm_ops.py) must be
mathematically identical to the NHWC train path — same params, same batch
stats updates, same gradients — since it is a pure layout re-expression.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.engine.losses import segmentation_loss
from mspl_tpu.models import ESPNetv2Segmentation, init_model
from mspl_tpu.ops.cm_ops import (adaptive_avg_pool_cm, cm_conv1x1,
                                 cm_conv3x3, cm_dw3x3, channel_shuffle_cm)


def _nhwc(x_cm):
    return jnp.transpose(x_cm, (0, 2, 3, 1))


def _cm(x_nhwc):
    return jnp.transpose(x_nhwc, (0, 3, 1, 2))


# ---------- op-level: cm ops vs their NHWC references ----------

def test_cm_conv_ops_match_nhwc():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 12)).astype(np.float32))
    xc = _cm(x)

    k1 = jnp.asarray(rng.normal(size=(1, 1, 12, 20)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(_nhwc(cm_conv1x1(xc, k1)), ref, rtol=2e-5,
                               atol=2e-5)

    k3 = jnp.asarray(rng.normal(size=(3, 3, 12, 8)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(_nhwc(cm_conv3x3(xc, k3)), ref, rtol=2e-5,
                               atol=2e-5)

    # grouped: block-diagonal equivalence (groups=4: 3 -> 2 ch per group)
    kg = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, kg, (1, 1), [(1, 1), (1, 1)], feature_group_count=4,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(_nhwc(cm_conv3x3(xc, kg, groups=4)), ref,
                               rtol=2e-5, atol=2e-5)

    kd = jnp.asarray(rng.normal(size=(3, 3, 1, 12)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, kd, (1, 1), [(1, 1), (1, 1)], feature_group_count=12,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(_nhwc(cm_dw3x3(xc, kd)), ref, rtol=2e-5,
                               atol=2e-5)


def test_cm_shuffle_and_pool_match_nhwc():
    from mspl_tpu.layers.pyramid_pool import channel_shuffle
    from mspl_tpu.ops.resize import adaptive_avg_pool

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 20, 10)).astype(np.float32))
    np.testing.assert_array_equal(
        _nhwc(channel_shuffle_cm(_cm(x), 5)), channel_shuffle(x, 5))
    np.testing.assert_allclose(
        _nhwc(adaptive_avg_pool_cm(_cm(x), (4, 5))),
        adaptive_avg_pool(x, (4, 5)), rtol=1e-6, atol=1e-6)


# ---------- model-level: whole train forward/backward parity ----------

def _models(num_classes=7, s=0.5):
    nhwc = ESPNetv2Segmentation(num_classes=num_classes, s=s)
    cm = ESPNetv2Segmentation(num_classes=num_classes, s=s, cm_decoder=True)
    variables = init_model(nhwc, (32, 48), rng=jax.random.PRNGKey(0))
    return nhwc, cm, variables


@pytest.mark.slow  # ~2 min on 1 core: two full train forwards
def test_cm_decoder_train_forward_matches_nhwc():
    nhwc, cm, variables = _models()
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 32, 48, 3)).astype(np.float32))

    out_ref, mut_ref = nhwc.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    out_cm, mut_cm = cm.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    assert out_cm.shape == out_ref.shape
    np.testing.assert_allclose(out_cm, out_ref, rtol=2e-4, atol=2e-4)
    # batch-stat EMA updates agree leaf-by-leaf
    ref_leaves = jax.tree_util.tree_leaves_with_path(mut_ref["batch_stats"])
    cm_leaves = dict(jax.tree_util.tree_leaves_with_path(
        mut_cm["batch_stats"]))
    assert len(ref_leaves) == len(cm_leaves)
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(cm_leaves[path], leaf, rtol=2e-4,
                                   atol=2e-4, err_msg=str(path))


@pytest.mark.slow  # ~3 min on 1 core: two full train fwd+bwd
def test_cm_decoder_gradients_match_nhwc():
    nhwc, cm, variables = _models()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, size=(2, 32, 48)).astype(
        np.int32))

    def loss_fn(model):
        def f(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return segmentation_loss(out, labels)
        return f

    l_ref, g_ref = jax.value_and_grad(loss_fn(nhwc))(variables["params"])
    l_cm, g_cm = jax.value_and_grad(loss_fn(cm))(variables["params"])
    np.testing.assert_allclose(l_cm, l_ref, rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    cm_leaves = dict(jax.tree_util.tree_leaves_with_path(g_cm))
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(cm_leaves[path], leaf, rtol=5e-3,
                                   atol=5e-5, err_msg=str(path))


@pytest.mark.slow  # ~1 min on 1 core
def test_cm_decoder_eval_unaffected():
    """cm_decoder only reroutes train=True; eval must be bit-identical to
    the plain model (same object path, same kernels)."""
    nhwc, cm, variables = _models()
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 32, 48, 3)).astype(np.float32))
    a = nhwc.apply(variables, x, train=False)
    b = cm.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loss_channel_axis_matches():
    """segmentation_loss(channel_axis=1) on [B,C,H,W] equals the NHWC form
    for every option combination (weights, reg modes, batch mask)."""
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(size=(3, 8, 10, 6)).astype(np.float32))
    labels = np.asarray(rng.integers(0, 6, size=(3, 8, 10)), np.int32)
    labels[0, :2] = 255  # ignore pixels
    labels = jnp.asarray(labels)
    cw = jnp.asarray(rng.uniform(0.5, 2.0, size=6).astype(np.float32))
    mask = jnp.asarray([True, True, False])
    for kw in ({}, {"class_weights": cw}, {"batch_mask": mask},
               {"reg_mode": "kld", "reg_weight": 0.1},
               {"reg_mode": "ent", "reg_weight": 0.1},
               {"class_weights": cw, "batch_mask": mask,
                "reg_mode": "kld", "reg_weight": 0.3}):
        ref = segmentation_loss(logits, labels, **kw)
        got = segmentation_loss(_cm(logits), labels, channel_axis=1, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-6, err_msg=str(kw))
