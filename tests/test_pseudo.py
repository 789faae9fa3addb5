"""Pseudo-label engine tests (SURVEY.md §7 stage 6 gate: property tests +
golden behavior; §4 property list: fusion permutation-invariant, threshold
monotone in tau, LUT conversion preserves mass)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mspl_tpu.data.label_space import label_conversion_matrix
from mspl_tpu.pseudo.cbst import (
    class_confidence_histograms,
    kc_from_histograms,
    sweep_kc,
)
from mspl_tpu.pseudo.generate import SourceModel, convert_probs, fused_pseudo_pass
from mspl_tpu.utils.registry import IGNORE_LABEL


def _rand_logits(rng, b, h, w, c):
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32) * 2)


def _setup(rng, n_models=3):
    datasets = ["camvid", "cityscapes", "forest"][:n_models]
    convs = [label_conversion_matrix(d) for d in datasets]
    logits = [_rand_logits(rng, 2, 8, 10, m.shape[0]) for m in convs]
    return logits, convs


def test_soft_fusion_matches_manual():
    rng = np.random.default_rng(0)
    logits, convs = _setup(rng)
    label, conf = fused_pseudo_pass(logits, convs, mode="soft")
    # manual numpy computation
    qs = []
    for lg, m in zip(logits, convs):
        x = np.asarray(lg, np.float64)
        p = np.exp(x - x.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        qs.append(p @ np.asarray(m, np.float64))
    fused = np.mean(qs, axis=0)[..., :3]
    np.testing.assert_array_equal(np.asarray(label), fused.argmax(-1))
    np.testing.assert_allclose(np.asarray(conf), fused.max(-1), rtol=1e-5)


def test_soft_fusion_matches_torch_oracle():
    """Cross-framework fp32 parity of the full pseudo pass (the north-star
    quality gate, BASELINE.json:5): an independent torch implementation of
    softmax -> label-space pooling -> soft fusion -> kc threshold must
    produce identical per-pixel labels and matching confidences."""
    import torch

    rng = np.random.default_rng(7)
    logits, convs = _setup(rng)
    kc = jnp.asarray([0.45, 0.5, 0.4], jnp.float32)
    label, conf = fused_pseudo_pass(logits, convs, mode="soft", kc=kc)

    with torch.no_grad():
        qs = []
        for lg, m in zip(logits, convs):
            t = torch.from_numpy(np.asarray(lg))
            p = torch.softmax(t, dim=-1)
            qs.append(p @ torch.from_numpy(np.asarray(m, np.float32)))
        fused = torch.stack(qs).mean(0)[..., :3]
        t_conf, t_label = fused.max(-1)
        t_label = torch.where(
            t_conf >= torch.as_tensor(np.asarray(kc))[t_label],
            t_label, torch.full_like(t_label, IGNORE_LABEL))
    np.testing.assert_array_equal(np.asarray(label), t_label.numpy())
    np.testing.assert_allclose(np.asarray(conf), t_conf.numpy(),
                               rtol=2e-5, atol=2e-6)


def test_fusion_permutation_invariant():
    rng = np.random.default_rng(1)
    logits, convs = _setup(rng)
    l1, c1 = fused_pseudo_pass(logits, convs, mode="soft")
    perm = [2, 0, 1]
    l2, c2 = fused_pseudo_pass([logits[i] for i in perm],
                               [convs[i] for i in perm], mode="soft")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


def test_threshold_monotone_in_tau():
    rng = np.random.default_rng(2)
    logits, convs = _setup(rng)
    kept = []
    for tau in (0.0, 0.3, 0.5, 0.7, 0.95):
        lab, _ = fused_pseudo_pass(logits, convs, mode="soft",
                                   kc=jnp.full((3,), tau))
        kept.append(int((np.asarray(lab) != IGNORE_LABEL).sum()))
    assert all(a >= b for a, b in zip(kept, kept[1:])), kept
    assert kept[0] == np.prod((2, 8, 10))  # tau=0 keeps everything


def test_per_class_kc_thresholds_apply_per_class():
    rng = np.random.default_rng(3)
    logits, convs = _setup(rng)
    lab_all, conf = fused_pseudo_pass(logits, convs, mode="soft")
    kc = np.array([0.0, 1.0, 0.0], np.float32)  # kill class 1 only
    lab, _ = fused_pseudo_pass(logits, convs, mode="soft", kc=jnp.asarray(kc))
    lab, lab_all = np.asarray(lab), np.asarray(lab_all)
    assert not (lab == 1).any()
    keep_mask = lab != IGNORE_LABEL
    np.testing.assert_array_equal(lab[keep_mask], lab_all[keep_mask])
    assert (lab_all[~keep_mask] == 1).all()


def test_hard_fusion_agreement():
    # 3 "models" in the same 3-class space with identity conversion
    ident = label_conversion_matrix("greenhouse")
    big = 50.0
    # pixel 0: all agree class 2; pixel 1: 2 vs 1 split; pixel 2: 1/1/1 split
    def mk(l0, l1, l2):
        x = np.full((1, 1, 3, 3), -big, np.float32)
        for i, l in enumerate((l0, l1, l2)):
            x[0, 0, i, l] = big
        return jnp.asarray(x)

    logits = [mk(2, 0, 0), mk(2, 0, 1), mk(2, 1, 2)]
    lab, conf = fused_pseudo_pass(logits, [ident] * 3, mode="hard")
    lab, conf = np.asarray(lab), np.asarray(conf)
    assert lab[0, 0, 0] == 2 and conf[0, 0, 0] == pytest.approx(1.0)
    assert lab[0, 0, 1] == 0 and conf[0, 0, 1] == pytest.approx(2 / 3)
    assert lab[0, 0, 2] == IGNORE_LABEL  # 1/1/1 tie < strict majority 2

    # unanimity requirement drops the 2/3 pixel too
    lab3, _ = fused_pseudo_pass(logits, [ident] * 3, mode="hard", min_agree=3)
    assert np.asarray(lab3)[0, 0, 1] == IGNORE_LABEL


def test_convert_probs_mass_and_shapes():
    rng = np.random.default_rng(4)
    m = label_conversion_matrix("cityscapes")
    x = rng.normal(size=(2, 4, 4, 19)).astype(np.float32)
    p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
    q = np.asarray(convert_probs(jnp.asarray(p), m))
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-5)  # mass preserved
    assert q.shape == (2, 4, 4, 4)


def test_kc_histogram_vs_exact_sort():
    rng = np.random.default_rng(5)
    n = 20000
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    confs = rng.beta(5, 2, size=n).astype(np.float32)
    labels[:100] = IGNORE_LABEL
    for p in (0.2, 0.5, 0.8):
        kc = sweep_kc(labels, confs, 3, p)
        for c in range(3):
            pop = np.sort(confs[labels == c])[::-1]
            exact = pop[min(int(p * len(pop)), len(pop) - 1)]
            assert abs(kc[c] - exact) < 2e-3, (c, p, kc[c], exact)
        # thresholding with kc keeps ~p of each class
        for c in range(3):
            sel = (labels == c) & (confs >= kc[c])
            frac = sel.sum() / (labels == c).sum()
            assert abs(frac - p) < 0.02


def test_kc_edge_cases():
    hist = np.zeros((3, 64))
    hist[0, 60] = 10  # all of class 0 confident
    kc = kc_from_histograms(hist, 0.5)
    assert kc[1] == 0.0 and kc[2] == 0.0  # empty classes keep everything
    assert 0.9 < kc[0] <= 0.95
    assert (kc_from_histograms(hist, 1.0) == 0).all()


def test_histograms_device_accumulation():
    rng = np.random.default_rng(6)
    lab = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)).astype(np.int32))
    conf = jnp.asarray(rng.uniform(size=(2, 8, 8)).astype(np.float32))
    h = np.asarray(class_confidence_histograms(lab, conf, 4, 128))
    assert h.shape == (4, 128)
    assert h.sum() == 2 * 8 * 8
    for c in range(4):
        assert h[c].sum() == int((np.asarray(lab) == c).sum())


def test_histogram_matmul_path_matches_scatter():
    """The MXU two-level one-hot histogram (used for large inputs on TPU)
    must equal the scatter-add path bit-for-bit."""
    from mspl_tpu.pseudo.cbst import class_confidence_histograms

    rng = np.random.default_rng(17)
    lab = rng.integers(0, 4, (3, 200, 200)).astype(np.int32)
    lab[lab == 3] = IGNORE_LABEL
    conf = rng.uniform(0, 1, lab.shape).astype(np.float32)
    # include exact bin-edge values (conf*bins integer) to pin flooring
    conf.ravel()[:100] = np.linspace(0, 1, 100)
    args = (jnp.asarray(lab), jnp.asarray(conf), 3, 4096)
    h_scatter = class_confidence_histograms(*args)
    h_matmul = class_confidence_histograms(*args, force_matmul=True)
    np.testing.assert_array_equal(np.asarray(h_scatter),
                                  np.asarray(h_matmul))


def test_entropy_confidence_matches_torch_oracle():
    """Entropy thresholding family (BASELINE.json:5 "confidence/entropy
    thresholding"): normalized anti-entropy of the fused T+1 distribution,
    checked against an independent torch computation."""
    import torch

    rng = np.random.default_rng(8)
    logits, convs = _setup(rng)
    label, conf = fused_pseudo_pass(logits, convs, mode="soft",
                                    conf_mode="entropy")
    with torch.no_grad():
        qs = []
        for lg, m in zip(logits, convs):
            t = torch.from_numpy(np.asarray(lg))
            p = torch.softmax(t, dim=-1)
            qs.append(p @ torch.from_numpy(np.asarray(m, np.float32)))
        fused = torch.stack(qs).mean(0)  # [B,H,W,T+1]
        h = -(fused * torch.log(fused.clamp_min(1e-30))).sum(-1)
        t_conf = 1.0 - h / np.log(fused.shape[-1])
        t_label = fused[..., :3].argmax(-1)
    np.testing.assert_array_equal(np.asarray(label), t_label.numpy())
    np.testing.assert_allclose(np.asarray(conf), t_conf.numpy(),
                               rtol=2e-5, atol=2e-6)
    assert (np.asarray(conf) >= -1e-6).all() and (np.asarray(conf) <= 1 + 1e-6).all()


def test_entropy_threshold_monotone_in_tau():
    rng = np.random.default_rng(9)
    logits, convs = _setup(rng)
    kept = []
    for tau in (0.0, 0.2, 0.4, 0.6, 0.9):
        lab, _ = fused_pseudo_pass(logits, convs, mode="soft",
                                   conf_mode="entropy", kc=jnp.full((3,), tau))
        kept.append(int((np.asarray(lab) != IGNORE_LABEL).sum()))
    assert all(a >= b for a, b in zip(kept, kept[1:])), kept
    assert kept[0] == np.prod((2, 8, 10))


def test_entropy_hard_mode_vote_distribution():
    ident = label_conversion_matrix("greenhouse")
    big = 50.0

    def mk(l0, l1):
        x = np.full((1, 1, 2, 3), -big, np.float32)
        for i, l in enumerate((l0, l1)):
            x[0, 0, i, l] = big
        return jnp.asarray(x)

    # pixel 0 unanimous (entropy 0 -> conf 1), pixel 1 a 2/1 split
    logits = [mk(2, 0), mk(2, 0), mk(2, 1)]
    lab, conf = fused_pseudo_pass(logits, [ident] * 3, mode="hard",
                                  conf_mode="entropy")
    conf = np.asarray(conf)
    assert conf[0, 0, 0] == pytest.approx(1.0, abs=1e-6)
    # 2/3 vs 1/3 split over 4 outcomes (T=3 + ignore)
    want = 1.0 - (-(2 / 3) * np.log(2 / 3) - (1 / 3) * np.log(1 / 3)) / np.log(4)
    assert conf[0, 0, 1] == pytest.approx(want, abs=1e-6)
    assert np.asarray(lab)[0, 0, 0] == 2


def test_entropy_ordering_vs_prob():
    """A peaked fused distribution must rank above a flat one in both
    confidence families (sanity link between the two modes)."""
    rng = np.random.default_rng(10)
    logits, convs = _setup(rng)
    _, c_prob = fused_pseudo_pass(logits, convs, mode="soft")
    _, c_ent = fused_pseudo_pass(logits, convs, mode="soft",
                                 conf_mode="entropy")
    c_prob, c_ent = np.asarray(c_prob).ravel(), np.asarray(c_ent).ravel()
    hi, lo = np.argmax(c_prob), np.argmin(c_prob)
    assert c_ent[hi] > c_ent[lo]


def test_mesh_generation_bit_exact_fast():
    """FAST-TIER mesh gate (VERDICT r4 item 6): the sharded generation
    sweep — DP mesh AND ('model','data') mesh with psum fusion — must be
    bit-identical to the single-device path.  Cheap closure sources keep
    this under ~20 s so a sharded-vs-single divergence fails while
    iterating, not only in the ~1 h slow tier (the full-model CLI variant
    lives in tests/test_cli_mesh.py)."""
    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.parallel.mesh import make_mesh
    from mspl_tpu.pseudo.generate import PseudoLabelGenerator
    from mspl_tpu.utils.registry import IMAGENET_MEAN, IMAGENET_STD

    t = 3
    target = SyntheticSegmentation(num_classes=t, size_wh=(48, 32),
                                   length=8, seed=21, unlabeled=True)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    pal = jnp.asarray(target.palette, jnp.float32) / 255.0

    def _src(sharp, name):
        def apply_fn(x):
            rgb = x * std + mean
            d2 = ((rgb[..., None, :] - pal) ** 2).sum(-1)
            return -sharp * d2 * 100.0
        conv = np.concatenate([np.eye(t, dtype=np.float32),
                               np.zeros((t, 1), np.float32)], axis=1)
        return SourceModel(name=name, apply_fn=apply_fn, conversion=conv)

    sources = [_src(4.0, "a"), _src(2.0, "b")]

    def sweep(mesh):
        return PseudoLabelGenerator(sources, mesh=mesh)(
            DataLoader(target, batch_size=8))

    lab0, conf0, idx0 = sweep(None)
    for mesh in (make_mesh(model=1), make_mesh(model=2)):
        lab, conf, idx = sweep(mesh)
        np.testing.assert_array_equal(lab, lab0)
        np.testing.assert_array_equal(conf, conf0)
        np.testing.assert_array_equal(idx, idx0)


def test_pipeline_sweep_bit_exact(monkeypatch):
    """MSPL_PSEUDO_PIPELINE=1 (two-deep dispatch, the locally-attached-TPU
    mode) must return arrays bit-identical to the default serial order,
    including a padded tail batch (r5 review: the pending/flush reordering
    had no automated parity gate)."""
    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.generate import PseudoLabelGenerator
    from mspl_tpu.utils.registry import IMAGENET_MEAN, IMAGENET_STD

    t = 3
    # length 10 @ batch 4 -> the tail batch is padded (2 valid rows)
    target = SyntheticSegmentation(num_classes=t, size_wh=(32, 24),
                                   length=10, seed=5, unlabeled=True)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    pal = jnp.asarray(target.palette, jnp.float32) / 255.0

    def apply_fn(x):
        rgb = x * std + mean
        return -((rgb[..., None, :] - pal) ** 2).sum(-1) * 200.0

    conv = np.concatenate([np.eye(t, dtype=np.float32),
                           np.zeros((t, 1), np.float32)], axis=1)
    gen = PseudoLabelGenerator(
        [SourceModel(name="a", apply_fn=apply_fn, conversion=conv)])

    def sweep():
        return gen(DataLoader(target, batch_size=4))

    monkeypatch.delenv("MSPL_PSEUDO_PIPELINE", raising=False)
    lab0, conf0, idx0 = sweep()
    assert lab0.shape[0] == 10
    monkeypatch.setenv("MSPL_PSEUDO_PIPELINE", "1")
    lab1, conf1, idx1 = sweep()
    np.testing.assert_array_equal(lab0, lab1)
    np.testing.assert_array_equal(conf0, conf1)
    np.testing.assert_array_equal(idx0, idx1)


def test_decoder_res_fusion_exact_when_no_resize():
    """`fused_pseudo_soft_decoder_res` with out_hw == logits resolution has
    NO approximation (the resize is identity) and must match the NHWC
    reference pass bit-for-bit; with a 2x out_hw the result stays a valid
    thresholded label map over the same classes."""
    from mspl_tpu.pseudo.generate import fused_pseudo_soft_decoder_res

    rng = np.random.default_rng(3)
    logits, convs = _setup(rng)
    logits_cm = [jnp.transpose(l, (0, 3, 1, 2)) for l in logits]
    kc = jnp.asarray([0.4, 0.5, 0.6], jnp.float32)

    lab_ref, conf_ref = fused_pseudo_pass(logits, convs, mode="soft", kc=kc)
    h, w = logits[0].shape[1:3]
    lab, conf = fused_pseudo_soft_decoder_res(logits_cm, convs, (h, w),
                                              kc=kc)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf_ref),
                               rtol=1e-6, atol=1e-6)

    lab2, conf2 = fused_pseudo_soft_decoder_res(logits_cm, convs,
                                                (2 * h, 2 * w), kc=kc)
    lab2 = np.asarray(lab2)
    assert lab2.shape == (logits[0].shape[0], 2 * h, 2 * w)
    assert set(np.unique(lab2)) <= {0, 1, 2, 255}
    c2 = np.asarray(conf2)
    assert np.all((c2 >= 0) & (c2 <= 1.0 + 1e-6))

    # entropy confidence family is supported too
    lab3, conf3 = fused_pseudo_soft_decoder_res(
        logits_cm, convs, (h, w), kc=None, conf_mode="entropy")
    ref3 = fused_pseudo_pass(logits, convs, mode="soft", kc=None,
                             conf_mode="entropy")
    np.testing.assert_array_equal(np.asarray(lab3), np.asarray(ref3[0]))
    np.testing.assert_allclose(np.asarray(conf3), np.asarray(ref3[1]),
                               rtol=1e-5, atol=1e-6)
