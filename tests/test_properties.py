"""Hypothesis property tests (SURVEY.md §4: "Property tests (hypothesis
available): fusion is permutation-invariant across models; thresholding
monotone in tau; LUT conversion preserves mass")."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from mspl_tpu.data.label_space import label_conversion_matrix
from mspl_tpu.engine.metrics import confusion_matrix, iou_from_confusion
from mspl_tpu.pseudo.cbst import kc_from_histograms
from mspl_tpu.pseudo.generate import convert_probs, fused_pseudo_pass
from mspl_tpu.utils.registry import IGNORE_LABEL

_SETTINGS = dict(max_examples=15, deadline=None)


@st.composite
def logit_sets(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    n_models = draw(st.integers(1, 3))
    rng = np.random.default_rng(seed)
    names = ["camvid", "cityscapes", "forest"][:n_models]
    convs = [label_conversion_matrix(n) for n in names]
    logits = [
        jnp.asarray(rng.normal(size=(1, 4, 6, m.shape[0])).astype(np.float32)
                    * draw(st.floats(0.5, 5.0)))
        for m in convs
    ]
    return logits, convs, rng


@given(logit_sets())
@settings(**_SETTINGS)
def test_mass_preservation(data):
    logits, convs, _ = data
    for lg, m in zip(logits, convs):
        p = np.exp(np.asarray(lg, np.float64))
        p /= p.sum(-1, keepdims=True)
        q = np.asarray(convert_probs(jnp.asarray(p, jnp.float32), m))
        np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-4)


@given(logit_sets(), st.randoms())
@settings(**_SETTINGS)
def test_permutation_invariance(data, rnd):
    logits, convs, _ = data
    order = list(range(len(logits)))
    rnd.shuffle(order)
    l1, c1 = fused_pseudo_pass(logits, convs, mode="soft")
    l2, c2 = fused_pseudo_pass([logits[i] for i in order],
                               [convs[i] for i in order], mode="soft")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


@given(logit_sets(), st.floats(0.0, 1.0), st.floats(0.0, 1.0))
@settings(**_SETTINGS)
def test_threshold_monotone(data, t1, t2):
    logits, convs, _ = data
    lo, hi = min(t1, t2), max(t1, t2)
    lab_lo, _ = fused_pseudo_pass(logits, convs, kc=jnp.full((3,), lo))
    lab_hi, _ = fused_pseudo_pass(logits, convs, kc=jnp.full((3,), hi))
    kept_lo = np.asarray(lab_lo) != IGNORE_LABEL
    kept_hi = np.asarray(lab_hi) != IGNORE_LABEL
    # pixels surviving the higher threshold survive the lower one too
    assert (kept_lo | ~kept_hi).all()
    # and keep identical labels
    np.testing.assert_array_equal(np.asarray(lab_lo)[kept_hi],
                                  np.asarray(lab_hi)[kept_hi])


@given(st.integers(0, 2**31 - 1), st.floats(0.05, 0.95))
@settings(**_SETTINGS)
def test_kc_keeps_at_least_p(seed, p):
    """CBST guarantee: at least p of each non-empty class survives kc."""
    rng = np.random.default_rng(seed)
    hist = rng.integers(0, 50, size=(3, 64)).astype(np.float64)
    kc = kc_from_histograms(hist, p)
    for c in range(3):
        total = hist[c].sum()
        if total == 0:
            assert kc[c] == 0
            continue
        surviving = hist[c, int(kc[c] * 64):].sum()
        assert surviving >= p * total - 1e-9


@given(st.integers(0, 2**31 - 1))
@settings(**_SETTINGS)
def test_confusion_matrix_total_and_diag(seed):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, 4, size=(3, 5, 5)).astype(np.int32)
    label = rng.integers(0, 4, size=(3, 5, 5)).astype(np.int32)
    label[rng.uniform(size=label.shape) < 0.2] = IGNORE_LABEL
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 4))
    assert cm.sum() == (label != IGNORE_LABEL).sum()
    # perfect prediction -> diagonal cm and mIoU 1 on present classes
    cm2 = np.asarray(confusion_matrix(jnp.asarray(label), jnp.asarray(label), 4))
    assert np.all(cm2 == np.diag(np.diag(cm2)))
    _, miou = iou_from_confusion(cm2)
    if cm2.sum() > 0:
        np.testing.assert_allclose(miou, 1.0)
