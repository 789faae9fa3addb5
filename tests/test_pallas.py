"""Pallas fused pseudo-label kernel vs the jnp reference implementation
(SURVEY.md §7 stage 7 gate: bitwise-tolerant match vs stage-6 impl).
Runs in interpreter mode on CPU; the same kernel compiles on TPU."""

import numpy as np
import pytest
import jax.numpy as jnp

from mspl_tpu.data.label_space import label_conversion_matrix
from mspl_tpu.ops.pallas_pseudo import fused_pseudo_pass_pallas
from mspl_tpu.pseudo.generate import fused_pseudo_pass
from mspl_tpu.utils.registry import IGNORE_LABEL


def _setup(rng, b=2, h=8, w=16, n_models=3):
    datasets = ["camvid", "cityscapes", "forest"][:n_models]
    convs = [label_conversion_matrix(d) for d in datasets]
    logits = [
        jnp.asarray(rng.normal(size=(b, h, w, m.shape[0])).astype(np.float32) * 3)
        for m in convs
    ]
    return logits, convs


@pytest.mark.parametrize("conf_mode", ["prob", "entropy"])
@pytest.mark.parametrize("mode", ["soft", "hard"])
@pytest.mark.parametrize("with_kc", [False, True])
def test_pallas_matches_jnp(mode, with_kc, conf_mode):
    rng = np.random.default_rng(0)
    logits, convs = _setup(rng)
    kc = jnp.asarray([0.4, 0.6, 0.5], jnp.float32) if with_kc else None
    ref_lab, ref_conf = fused_pseudo_pass(logits, convs, mode=mode, kc=kc,
                                          conf_mode=conf_mode)
    lab, conf = fused_pseudo_pass_pallas(logits, convs, mode=mode, kc=kc,
                                         interpret=True, conf_mode=conf_mode)
    assert lab.shape == ref_lab.shape and conf.shape == ref_conf.shape
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                               rtol=1e-5, atol=1e-6)
    # ties under fp reorderings could differ in principle; require equality
    # on pixels where the margin is non-negligible
    margin_ok = np.abs(np.asarray(conf) - np.asarray(ref_conf)) < 1e-6
    np.testing.assert_array_equal(np.asarray(lab)[margin_ok],
                                  np.asarray(ref_lab)[margin_ok])


def test_pallas_non_tile_multiple_and_single_model():
    rng = np.random.default_rng(1)
    # 1 model, pixel count far from TILE_P multiple
    conv = label_conversion_matrix("forest")
    logits = [jnp.asarray(rng.normal(size=(1, 7, 13, 5)).astype(np.float32))]
    ref_lab, ref_conf = fused_pseudo_pass(logits, [conv], mode="soft")
    lab, conf = fused_pseudo_pass_pallas(logits, [conv], mode="soft",
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref_lab))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                               rtol=1e-5, atol=1e-6)


def test_pallas_hard_min_agree():
    rng = np.random.default_rng(2)
    logits, convs = _setup(rng, n_models=3)
    for agree in (1, 2, 3):
        ref_lab, _ = fused_pseudo_pass(logits, convs, mode="hard",
                                       min_agree=agree)
        lab, _ = fused_pseudo_pass_pallas(logits, convs, mode="hard",
                                          min_agree=agree, interpret=True)
        np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref_lab))


def test_pallas_ignore_pixels_thresholded():
    rng = np.random.default_rng(3)
    logits, convs = _setup(rng)
    kc = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)  # kc=1 kills everything
    lab, _ = fused_pseudo_pass_pallas(logits, convs, mode="soft", kc=kc,
                                      interpret=True)
    assert (np.asarray(lab) == IGNORE_LABEL).all()
