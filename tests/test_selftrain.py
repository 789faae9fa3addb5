"""Self-training orchestrator end-to-end smoke test (config #4/#5 shape,
SURVEY.md §3.3): generate -> class-balanced threshold -> fine-tune -> eval,
multi-round with growing p and ensemble growth."""

import numpy as np
import pytest
import jax.numpy as jnp

from mspl_tpu.data.datasets import SyntheticSegmentation
from mspl_tpu.data.loader import DataLoader
from mspl_tpu.models import ESPNetv2Segmentation, init_model
from mspl_tpu.pseudo.generate import SourceModel
from mspl_tpu.pseudo.self_training import (
    PseudoLabeledDataset,
    SelfTrainConfig,
    self_training,
)
from mspl_tpu.utils.registry import IGNORE_LABEL, IMAGENET_MEAN, IMAGENET_STD

NUM_CLASSES = 4


def _identity_conversion(t=NUM_CLASSES):
    return np.concatenate([np.eye(t, dtype=np.float32),
                           np.zeros((t, 1), np.float32)], axis=1)


def _palette_source(palette, sharp=4.0, name="oracle"):
    """Synthetic 'source model': logits from color distance to the class
    palette (the synthetic dataset paints classes with these colors)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    pal = jnp.asarray(palette, jnp.float32) / 255.0

    def apply_fn(imgs_norm):
        rgb = imgs_norm * std + mean  # back to [0,1]
        d2 = ((rgb[..., None, :] - pal) ** 2).sum(-1)  # [B,H,W,T]
        return -sharp * d2 * 100.0

    return SourceModel(name=name, apply_fn=apply_fn,
                       conversion=_identity_conversion())


@pytest.mark.slow
def test_self_training_rounds(tmp_path):
    target = SyntheticSegmentation(num_classes=NUM_CLASSES, size_wh=(48, 32),
                                   length=16, seed=3, unlabeled=True)
    # labeled val set from the same distribution
    val = SyntheticSegmentation(num_classes=NUM_CLASSES, size_wh=(48, 32),
                                length=8, seed=4)
    val_loader = DataLoader(val, batch_size=8)

    sources = [
        _palette_source(target.palette, sharp=4.0, name="src_a"),
        _palette_source(target.palette, sharp=2.0, name="src_b"),
    ]
    model = ESPNetv2Segmentation(num_classes=NUM_CLASSES, s=0.5,
                                 dec_base_planes=8)
    variables = init_model(model, (32, 48))

    cfg = SelfTrainConfig(
        rounds=2, p_init=0.5, p_step=0.2, fusion="soft", batch_size=8,
        epochs_per_round=6, crop_hw=(32, 48), scale_range=(0.9, 1.1),
        lr=0.01, optimizer="adam", scheduler="fixed",
        reg_mode="kld", reg_weight=0.05,
        out_dir=str(tmp_path / "labels"), ckpt_dir=str(tmp_path / "ckpt"),
        verbose=False,
    )
    res = self_training(model, variables, sources, target, val_loader,
                        NUM_CLASSES, cfg)

    assert len(res["history"]) == 2
    h0, h1 = res["history"]
    # p grows, ensemble grows (target model joins in round 1)
    assert h1["p"] > h0["p"]
    assert h1["n_sources"] == h0["n_sources"] + 1
    # kept fraction responds to class balancing but stays meaningful
    assert 0.2 < h0["frac_kept"] <= 1.0
    # the oracle sources make pseudo-labels good; model should adapt
    assert res["best_miou"] > 0.35, res["history"]

    # round artifacts on disk (PNG labels + train list, reference format)
    import os
    r0 = tmp_path / "labels" / "round0"
    assert (r0 / "train_list.txt").exists()
    assert len(list(r0.glob("pseudo_*.png"))) == 16


@pytest.mark.slow
def test_self_training_deeplab_backbone_swap(tmp_path):
    """Config #5's backbone swap: the self-training target model can be the
    DeepLab-family network instead of ESPNetv2 (BASELINE.json:11)."""
    from mspl_tpu.models import build_segmentation_model

    target = SyntheticSegmentation(num_classes=NUM_CLASSES, size_wh=(48, 32),
                                   length=8, seed=6, unlabeled=True)
    val = SyntheticSegmentation(num_classes=NUM_CLASSES, size_wh=(48, 32),
                                length=8, seed=7)
    sources = [_palette_source(target.palette, sharp=4.0, name="oracle")]
    model = build_segmentation_model("deeplabv3", num_classes=NUM_CLASSES)
    variables = init_model(model, (32, 48))
    cfg = SelfTrainConfig(
        rounds=1, p_init=0.6, p_step=0.1, fusion="soft", batch_size=8,
        epochs_per_round=2, crop_hw=(32, 48), scale_range=(0.95, 1.05),
        lr=0.005, optimizer="adam", scheduler="fixed",
        out_dir=str(tmp_path / "labels"), ckpt_dir=str(tmp_path / "ckpt"),
        verbose=False,
    )
    res = self_training(model, variables, sources, target,
                        DataLoader(val, batch_size=8), NUM_CLASSES, cfg)
    assert len(res["history"]) == 1
    assert 0.0 <= res["best_miou"] <= 1.0
    assert 0.1 < res["history"][0]["frac_kept"] <= 1.0


def test_on_device_round_state_matches_host():
    """The device-resident round path (return_device=True + apply_kc_device,
    the SelfTrainConfig.on_device default) is bit-identical to the host
    path: same labels/conf/indices (incl. the padded tail batch) and the
    same kc re-threshold result."""
    from mspl_tpu.pseudo.cbst import apply_kc_device, sweep_kc
    from mspl_tpu.pseudo.generate import generate_pseudo_labels

    target = SyntheticSegmentation(num_classes=NUM_CLASSES, size_wh=(32, 24),
                                   length=10, seed=9, unlabeled=True)
    sources = [
        _palette_source(target.palette, sharp=4.0, name="src_a"),
        _palette_source(target.palette, sharp=2.0, name="src_b"),
    ]
    loader = DataLoader(target, batch_size=4)  # 10 = 4+4+2: padded tail
    lab_h, conf_h, idx_h = generate_pseudo_labels(sources, loader)
    lab_d, conf_d, idx_d = generate_pseudo_labels(sources, loader,
                                                  return_device=True)
    assert lab_d.dtype == jnp.uint8  # labels cross the host boundary as u8
    np.testing.assert_array_equal(np.asarray(lab_d).astype(np.int32), lab_h)
    np.testing.assert_array_equal(np.asarray(conf_d), conf_h)
    np.testing.assert_array_equal(idx_d, idx_h)

    kc = sweep_kc(lab_h, conf_h, NUM_CLASSES, 0.5)
    safe = np.where(lab_h == IGNORE_LABEL, 0, lab_h)
    thr_h = np.where(conf_h >= kc[safe], lab_h, IGNORE_LABEL).astype(np.int32)
    thr_d = np.asarray(apply_kc_device(lab_d, conf_d, kc)).astype(np.int32)
    np.testing.assert_array_equal(thr_d, thr_h)
    # kc swept from the device-resident set equals the host sweep
    np.testing.assert_array_equal(sweep_kc(lab_d, conf_d, NUM_CLASSES, 0.5),
                                  kc)


def test_pseudo_labeled_dataset_roundtrip():
    base = SyntheticSegmentation(num_classes=3, size_wh=(16, 12), length=6,
                                 seed=5, unlabeled=True)
    labels = np.random.default_rng(0).integers(
        0, 3, size=(6, 12, 16)).astype(np.int32)
    indices = np.array([5, 4, 3, 2, 1, 0], np.int32)  # shuffled generation order
    ds = PseudoLabeledDataset(base, labels, indices)
    assert len(ds) == 6
    img, lab = ds.load(0)  # sorted -> original index 0 pairs with labels[5]
    np.testing.assert_array_equal(img, base.load(0)[0])
    np.testing.assert_array_equal(lab, labels[5])


def test_generator_reuse_matches_oneshot():
    """PseudoLabelGenerator built once and swept repeatedly is bit-identical
    to per-call generate_pseudo_labels, and two sweeps reuse ONE compiled
    pass (the r4 disk-backed finding: a fresh build costs ~31 s through the
    remote-TPU tunnel — BASELINE.md "Disk-backed end-to-end")."""
    from mspl_tpu.pseudo.generate import (PseudoLabelGenerator,
                                          generate_pseudo_labels)

    target = SyntheticSegmentation(num_classes=NUM_CLASSES, size_wh=(32, 24),
                                   length=10, seed=11, unlabeled=True)
    sources = [
        _palette_source(target.palette, sharp=4.0, name="src_a"),
        _palette_source(target.palette, sharp=2.0, name="src_b"),
    ]
    loader = DataLoader(target, batch_size=4)
    lab_ref, conf_ref, idx_ref = generate_pseudo_labels(sources, loader)

    gen = PseudoLabelGenerator(sources)
    pass0 = gen._batch_pass
    for _ in range(2):  # repeated sweeps: same program object, same bits
        lab, conf, idx = gen(loader)
        assert gen._batch_pass is pass0
        np.testing.assert_array_equal(lab, lab_ref)
        np.testing.assert_array_equal(conf, conf_ref)
        np.testing.assert_array_equal(idx, idx_ref)
    # mixed-mode call on the same generator: device-resident sweep agrees
    lab_d, conf_d, idx_d = gen(loader, return_device=True)
    np.testing.assert_array_equal(np.asarray(lab_d).astype(np.int32), lab_ref)
    np.testing.assert_array_equal(np.asarray(conf_d), conf_ref)
    np.testing.assert_array_equal(idx_d, idx_ref)


def _tiny_flax_sources(hw=(24, 32)):
    """Two real flax sources via make_source (which splits out weights)."""
    import jax

    from mspl_tpu.pseudo.generate import make_source

    sources = []
    for i, (ds_name, n_cls) in enumerate((("camvid", 11), ("forest", 5))):
        m = ESPNetv2Segmentation(num_classes=n_cls, s=0.5, dec_base_planes=8)
        v = init_model(m, hw, rng=jax.random.PRNGKey(40 + i))
        sources.append(make_source(ds_name, m, v, ds_name, num_target=3))
    return sources


@pytest.mark.slow  # several full-model XLA compiles; ~2-4 min on 1-core CPU
@pytest.mark.parametrize("use_mesh", [False, True])
def test_generator_params_as_args_one_trace(use_mesh):
    """params_as_args=True: swapping in NEW weights of the same shapes
    (the self-training round loop) reuses ONE compiled pass — no retrace —
    and is bit-identical to a fresh jit-constant generator built with those
    weights (VERDICT r4 item 3)."""
    import jax

    from mspl_tpu.pseudo.generate import PseudoLabelGenerator, make_source

    hw = (24, 32)
    target = SyntheticSegmentation(num_classes=3, size_wh=hw[::-1],
                                   length=8, seed=13, unlabeled=True)
    loader = DataLoader(target, batch_size=4)
    mesh = None
    if use_mesh:
        from mspl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model=2)

    sources = _tiny_flax_sources(hw)
    gen = PseudoLabelGenerator(sources, mesh=mesh, params_as_args=True)
    lab0, conf0, _ = gen(loader)
    assert gen.trace_count == 1

    # new weights, same shapes: the fine-tuned-target situation
    m1 = ESPNetv2Segmentation(num_classes=5, s=0.5, dec_base_planes=8)
    v_new = init_model(m1, hw, rng=jax.random.PRNGKey(99))
    gen.set_variables(1, v_new)
    lab1, conf1, _ = gen(loader)
    assert gen.trace_count == 1, "new weights must NOT retrace the pass"
    assert not np.array_equal(conf0, conf1), "new weights must change output"

    # vs a fresh jit-constant generator with the same weights: labels are
    # exact; confidences may differ by float-reassociation noise because
    # baked-constant weights let XLA fold/fuse differently than argument
    # weights (measured 1.5e-6 max abs on the CPU backend)
    fresh = [sources[0],
             make_source("forest", m1, v_new, "forest", num_target=3)]
    lab_ref, conf_ref, _ = PseudoLabelGenerator(fresh, mesh=mesh)(loader)
    np.testing.assert_array_equal(lab1, lab_ref)
    np.testing.assert_allclose(conf1, conf_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # 3 rounds x (generation + fine-tune + eval) compiles
def test_self_training_reuses_compiled_generation(tmp_path, monkeypatch):
    """The round loop builds ONE generator per ensemble shape and swaps the
    fine-tuned target weights in as arguments: rounds >= 2 must not retrace
    (VERDICT r4 item 3 DONE criterion)."""
    import importlib

    # the package re-exports the self_training FUNCTION under the same
    # name, shadowing the submodule attribute — resolve the module itself
    st = importlib.import_module("mspl_tpu.pseudo.self_training")

    built = []
    real_cls = st.PseudoLabelGenerator

    class Recording(real_cls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            built.append(self)

    monkeypatch.setattr(st, "PseudoLabelGenerator", Recording)

    hw = (24, 32)
    target = SyntheticSegmentation(num_classes=3, size_wh=hw[::-1],
                                   length=8, seed=7, unlabeled=True)
    sources = _tiny_flax_sources(hw)
    model = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(model, hw)
    cfg = SelfTrainConfig(
        rounds=3, p_init=0.5, p_step=0.1, batch_size=4, epochs_per_round=1,
        crop_hw=hw, scale_range=(0.95, 1.05), lr=1e-3, optimizer="sgd",
        scheduler="fixed", verbose=False)
    res = self_training(model, variables, sources, target, None, 3, cfg)

    assert len(res["history"]) == 3
    # one sources-only generator (round 0) + one sources+target generator
    # (rounds 1..2) — and the latter was traced exactly once
    assert len(built) == 2
    assert built[0].trace_count == 1
    assert built[1].trace_count == 1
    assert built[1]._params_as_args
