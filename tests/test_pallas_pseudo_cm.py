"""Channel-major fused pseudo pass (ops/pallas_pseudo_cm.py) must match the
NHWC jnp reference fused_pseudo_pass(mode='soft') bit-for-bit on labels and
to fp tolerance on confidences (interpret mode on the CPU test backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.data.label_space import label_conversion_matrix
from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_soft_cm
from mspl_tpu.pseudo.generate import fused_pseudo_pass


def _setup(rng, b=2, h=16, w=20):
    names_classes = (("camvid", 11), ("cityscapes", 19), ("forest", 5))
    logits, convs = [], []
    for name, c in names_classes:
        logits.append(jnp.asarray(rng.randn(b, h, w, c) * 2, jnp.float32))
        convs.append(label_conversion_matrix(name))
    return logits, convs


@pytest.mark.parametrize("conf_mode", ["prob", "entropy"])
@pytest.mark.parametrize("with_kc", [True, False])
def test_cm_kernel_matches_jnp(with_kc, conf_mode):
    rng = np.random.RandomState(0)
    logits, convs = _setup(rng)
    kc = jnp.asarray([0.4, 0.5, 0.6], jnp.float32) if with_kc else None
    want_lbl, want_conf = fused_pseudo_pass(logits, convs, mode="soft", kc=kc,
                                            conf_mode=conf_mode)
    logits_cm = [jnp.transpose(x, (0, 3, 1, 2)) for x in logits]
    got_lbl, got_conf = fused_pseudo_soft_cm(logits_cm, convs, kc,
                                             conf_mode=conf_mode)
    np.testing.assert_array_equal(np.asarray(got_lbl), np.asarray(want_lbl))
    np.testing.assert_allclose(np.asarray(got_conf), np.asarray(want_conf),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("conf_mode", ["prob", "entropy"])
@pytest.mark.parametrize("min_agree", [None, 3])
def test_cm_kernel_hard_matches_jnp(min_agree, conf_mode):
    from mspl_tpu.ops.pallas_pseudo_cm import fused_pseudo_cm

    rng = np.random.RandomState(3)
    logits, convs = _setup(rng)
    kc = jnp.asarray([0.4, 0.5, 0.6], jnp.float32)
    want_lbl, want_conf = fused_pseudo_pass(
        logits, convs, mode="hard", kc=kc, min_agree=min_agree,
        conf_mode=conf_mode)
    logits_cm = [jnp.transpose(x, (0, 3, 1, 2)) for x in logits]
    got_lbl, got_conf = fused_pseudo_cm(
        logits_cm, convs, kc, mode="hard", min_agree=min_agree,
        conf_mode=conf_mode)
    np.testing.assert_array_equal(np.asarray(got_lbl), np.asarray(want_lbl))
    np.testing.assert_allclose(np.asarray(got_conf), np.asarray(want_conf),
                               rtol=1e-5, atol=1e-5)


def test_cm_resize_matches_nhwc_resize():
    from mspl_tpu.ops.resize import resize_bilinear, resize_bilinear_to_cm

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 11, 4), jnp.float32)
    want = jnp.transpose(resize_bilinear(x, (18, 22), align_corners=True),
                         (0, 3, 1, 2))
    got = resize_bilinear_to_cm(x, (18, 22), align_corners=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow  # ~80 s on 1 core: two full-model forwards
def test_model_channel_major_logits_match():
    import jax

    from mspl_tpu.models import ESPNetv2Segmentation, init_model

    m_ref = ESPNetv2Segmentation(num_classes=5, s=0.5)
    m_cm = ESPNetv2Segmentation(num_classes=5, s=0.5,
                                channel_major_logits=True)
    v = init_model(m_ref, (32, 48))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 48, 3), jnp.float32)
    want = jnp.transpose(m_ref.apply(v, x, train=False), (0, 3, 1, 2))
    got = m_cm.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
