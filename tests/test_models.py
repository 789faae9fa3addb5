"""Model-level tests: the minimum end-to-end slice is config #1
(BASELINE.json:7): ESPNetv2 CamVid-shape inference, 480x360, 11 classes,
CPU-runnable (SURVEY.md §7 stage 3 gate).  Small shapes keep CI fast; the
full 480x360 shape is exercised once."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.models import (
    DeepLabV3,
    EESPNet,
    ESPNetv2Segmentation,
    build_segmentation_model,
    eespnet_channel_plan,
    init_model,
)


def test_channel_plan():
    assert eespnet_channel_plan(2.0) == (32, 128, 256, 512, 1024, 1280)
    assert eespnet_channel_plan(1.0) == (32, 64, 128, 256, 512, 1024)
    assert eespnet_channel_plan(0.5) == (16, 32, 64, 128, 256, 1024)


def test_backbone_classification_forward():
    m = EESPNet(s=0.5, num_classes=10)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_segmentation_forward_small():
    m = ESPNetv2Segmentation(num_classes=11, s=0.5)
    variables = init_model(m, (96, 128))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 96, 128, 3)),
                    jnp.float32)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 96, 128, 11)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_segmentation_forward_camvid_shape():
    # config #1: 480x360 (WxH), 11 classes — the reference's headline slice
    m = ESPNetv2Segmentation(num_classes=11, s=2.0)
    variables = init_model(m, (360, 480))
    x = jnp.zeros((1, 360, 480, 3), jnp.float32)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(variables, x)
    assert out.shape == (1, 360, 480, 11)


@pytest.mark.slow
def test_segmentation_odd_sizes_dont_crash():
    # 360 -> 180 -> 90 -> 45 -> 23: decoder must re-align odd skip sizes
    m = ESPNetv2Segmentation(num_classes=3, s=0.5)
    variables = init_model(m, (90, 120))
    out = m.apply(variables, jnp.zeros((1, 90, 120, 3)), train=False)
    assert out.shape == (1, 90, 120, 3)


def test_deeplab_forward_small():
    m = DeepLabV3(num_classes=5, stage_blocks=(1, 1, 1, 1))
    variables = init_model(m, (64, 64))
    out = m.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


def test_factory():
    m = build_segmentation_model("espnetv2", num_classes=4, s=0.5)
    assert isinstance(m, ESPNetv2Segmentation)
    m = build_segmentation_model("deeplabv3", num_classes=4)
    assert isinstance(m, DeepLabV3)
    with pytest.raises(ValueError):
        build_segmentation_model("nope", num_classes=4)


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    m = ESPNetv2Segmentation(num_classes=3, s=0.5)
    variables = init_model(m, (48, 64))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 48, 64, 3)),
                    jnp.float32)
    out, mutated = m.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    assert out.shape == (2, 48, 64, 3)
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.slow
def test_decoder_commuted_proj_matches_plain_order():
    """Eval commutes the pyrpool proj conv with the decoder upsample
    (pyramid_pool.py `pre=`); the result must match the reference order
    (upsample -> add -> CBR proj) to f32 rounding, and the train path must
    BE the reference order bit-exactly."""
    import mspl_tpu.layers.pyramid_pool as pp
    from mspl_tpu.ops.resize import resize_bilinear

    m = ESPNetv2Segmentation(num_classes=7, s=1.0)
    variables = init_model(m, (64, 96))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 96, 3)),
                    jnp.float32)
    y_commuted = m.apply(variables, x, train=False)

    orig = pp.EfficientPyrPool.__call__

    def plain_call(self, t, pre=None, train=False):
        if pre is not None:
            t = t + resize_bilinear(pre, (t.shape[1], t.shape[2]),
                                    align_corners=True, order="wh")
        return orig(self, t, None, train)

    pp.EfficientPyrPool.__call__ = plain_call
    try:
        y_plain = m.apply(variables, x, train=False)
        yt_plain = m.apply(variables, x, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(0)})[0]
    finally:
        pp.EfficientPyrPool.__call__ = orig

    scale = float(np.abs(np.asarray(y_plain)).max())
    assert np.abs(np.asarray(y_commuted) - np.asarray(y_plain)).max() \
        <= 1e-5 * scale
    yt = m.apply(variables, x, train=True, mutable=["batch_stats"],
                 rngs={"dropout": jax.random.PRNGKey(0)})[0]
    np.testing.assert_array_equal(np.asarray(yt), np.asarray(yt_plain))
