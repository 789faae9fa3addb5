"""Training engine tests: loss parity vs torch, mIoU correctness, schedules,
and the stage-5 gate — a small synthetic training run must learn
(SURVEY.md §7 stage 5: 'CamVid training run learns (loss ↓, mIoU ↑)')."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mspl_tpu.data.datasets import SyntheticSegmentation
from mspl_tpu.data.loader import DataLoader
from mspl_tpu.engine.losses import compute_class_weights, segmentation_loss
from mspl_tpu.engine.metrics import MIOU, confusion_matrix, iou_from_confusion
from mspl_tpu.engine.schedules import build_schedule
from mspl_tpu.engine.train import (
    TrainLoopConfig,
    build_optimizer,
    create_train_state,
    evaluate,
    make_eval_step,
    make_train_step,
    train_segmentation,
)
from mspl_tpu.models import ESPNetv2Segmentation, init_model
from mspl_tpu.utils.registry import IGNORE_LABEL


def test_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 6, 7, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 6, 7)).astype(np.int32)
    labels[0, 0, :3] = IGNORE_LABEL
    weights = rng.uniform(0.5, 2.0, size=5).astype(np.float32)

    ours = float(segmentation_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   class_weights=jnp.asarray(weights)))
    t = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
        weight=torch.from_numpy(weights),
        ignore_index=IGNORE_LABEL,
    )
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)

    # unweighted too
    ours_u = float(segmentation_loss(jnp.asarray(logits), jnp.asarray(labels)))
    t_u = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
        ignore_index=IGNORE_LABEL,
    )
    np.testing.assert_allclose(ours_u, float(t_u), rtol=1e-5)


def test_regularizers_change_loss_in_right_direction():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32) * 5  # confident
    labels = np.argmax(logits, -1).astype(np.int32)
    base = float(segmentation_loss(jnp.asarray(logits), jnp.asarray(labels)))
    kld = float(segmentation_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  reg_mode="kld", reg_weight=1.0))
    ent = float(segmentation_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  reg_mode="ent", reg_weight=1.0))
    # confident predictions are penalized by both confidence regularizers
    assert kld > base
    assert ent < base + 1e-6  # negative entropy of confident preds is ~0-bounded below


def test_batch_mask_excludes_padded_rows():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32)
    full = segmentation_loss(jnp.asarray(logits), jnp.asarray(labels))
    masked = segmentation_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        batch_mask=jnp.asarray([True, False]),
    )
    only0 = segmentation_loss(jnp.asarray(logits[:1]), jnp.asarray(labels[:1]))
    np.testing.assert_allclose(float(masked), float(only0), rtol=1e-6)
    assert abs(float(masked) - float(full)) > 1e-8


def test_class_weights_formula():
    hist = np.array([100, 10, 1], np.float64)
    w = compute_class_weights(hist)
    assert w[2] > w[1] > w[0] > 0


def test_confusion_matrix_and_miou():
    pred = np.array([[0, 1], [2, 1]], np.int32)
    label = np.array([[0, 1], [1, IGNORE_LABEL]], np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 3))
    expected = np.zeros((3, 3))
    expected[0, 0] = 1  # correct 0
    expected[1, 1] = 1  # correct 1
    expected[1, 2] = 1  # true 1 pred 2
    np.testing.assert_array_equal(cm, expected)
    iou, miou = iou_from_confusion(cm)
    np.testing.assert_allclose(iou[0], 1.0)
    np.testing.assert_allclose(iou[1], 0.5)  # tp=1, fn=1
    assert np.isnan(iou[2]) or iou[2] == 0.0  # class 2: tp=0, fp=1 -> 0

    acc = MIOU(3)
    acc.update_preds(pred, label)
    acc.update_preds(pred, label)
    _, miou2 = acc.get_iou()
    np.testing.assert_allclose(miou2, miou, rtol=1e-6)


def test_schedules():
    total = 100
    for name in ("poly", "step", "cyclic", "hybrid", "linear", "fixed"):
        sched = build_schedule(name, 0.1, total, steps_per_epoch=10)
        v0 = float(sched(0))
        v_end = float(sched(total - 1))
        assert v0 >= 0 and v_end >= 0
    poly = build_schedule("poly", 0.1, total)
    assert float(poly(0)) == pytest.approx(0.1, rel=1e-5)
    assert float(poly(99)) < 0.01
    lin = build_schedule("linear", 0.1, total)
    assert float(lin(50)) == pytest.approx(0.05, rel=1e-4)


@pytest.mark.slow
def test_synthetic_training_learns(tmp_path):
    """Stage-5 gate: tiny ESPNetv2 fits the synthetic dataset; loss drops,
    mIoU beats chance; checkpoint resume restores state."""
    ds = SyntheticSegmentation(num_classes=4, size_wh=(48, 32), length=16, seed=1)
    val = SyntheticSegmentation(num_classes=4, size_wh=(48, 32), length=8, seed=2)
    train_loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    val_loader = DataLoader(val, batch_size=8)

    model = ESPNetv2Segmentation(num_classes=4, s=0.5, dec_base_planes=8)
    variables = init_model(model, (32, 48))
    cfg = TrainLoopConfig(
        epochs=14, crop_hw=(32, 48), scale_range=(0.9, 1.1), lr=0.01,
        scheduler="fixed", optimizer="adam", weight_decay=1e-5,
        ckpt_dir=str(tmp_path / "ckpt"), verbose=False, seed=0,
    )
    res = train_segmentation(model, variables, train_loader, val_loader,
                             num_classes=4, cfg=cfg)
    losses = [h["loss"] for h in res["history"]]
    assert losses[-1] < losses[0] * 0.8, f"no learning: {losses}"
    assert res["best_miou"] > 0.35, f"mIoU too low: {res['best_miou']}"

    # resume path restores epoch counter and best metric
    cfg2 = TrainLoopConfig(**{**cfg.__dict__, "epochs": 15, "resume": True})
    res2 = train_segmentation(model, variables, train_loader, val_loader,
                              num_classes=4, cfg=cfg2)
    assert len(res2["history"]) == 1  # only the one extra epoch ran
    assert res2["best_miou"] >= res["best_miou"] - 1e-6


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """Preemption recovery (SURVEY.md §5): a run killed mid-epoch and
    resumed from its step-level checkpoint must reproduce the
    uninterrupted run exactly — same params, same data order, same
    augmentation rng."""
    import jax

    def build():
        ds = SyntheticSegmentation(num_classes=4, size_wh=(48, 32),
                                   length=24, seed=1)
        loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
        model = ESPNetv2Segmentation(num_classes=4, s=0.5, dec_base_planes=8)
        variables = init_model(model, (32, 48))
        return model, variables, loader

    common = dict(epochs=2, crop_hw=(32, 48), scale_range=(0.9, 1.1),
                  lr=0.01, scheduler="fixed", optimizer="adam",
                  weight_decay=1e-5, verbose=False, seed=0)

    # uninterrupted: 2 epochs x 3 steps
    model, variables, loader = build()
    cfg_a = TrainLoopConfig(ckpt_dir=str(tmp_path / "a"), **common)
    res_a = train_segmentation(model, variables, loader, None,
                               num_classes=4, cfg=cfg_a)

    # killed after 4 of 6 steps (mid-epoch 1), then resumed
    model, variables, loader = build()
    cfg_b = TrainLoopConfig(ckpt_dir=str(tmp_path / "b"),
                            ckpt_every_steps=1, max_steps=4, **common)
    train_segmentation(model, variables, loader, None, num_classes=4,
                       cfg=cfg_b)
    meta_path = tmp_path / "b" / "checkpoint_last.json"
    import json
    meta = json.loads(meta_path.read_text())
    assert meta["epoch"] == 1 and meta["step_in_epoch"] == 1

    model, variables, loader = build()
    cfg_b2 = TrainLoopConfig(ckpt_dir=str(tmp_path / "b"),
                             ckpt_every_steps=1, resume=True, **common)
    res_b = train_segmentation(model, variables, loader, None,
                               num_classes=4, cfg=cfg_b2)

    pa = jax.device_get(res_a["state"].params)
    pb = jax.device_get(res_b["state"].params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), pa, pb)


@pytest.mark.slow
def test_remat_step_matches_plain():
    """jax.checkpoint rematerialization (TrainLoopConfig.remat) must not
    change the step's math: identical loss and updated params."""
    import optax

    from mspl_tpu.engine.train import (build_optimizer, create_train_state,
                                       make_train_step)
    from mspl_tpu.models import ESPNetv2Segmentation, init_model

    rng = np.random.RandomState(0)
    model = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(model, (16, 24))
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (4, 16, 24, 3)), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 3, (4, 16, 24)), jnp.int32),
        "valid": jnp.ones((4,), bool),
    }
    key = jax.random.PRNGKey(0)
    outs = []
    for remat in (False, True):
        tx = build_optimizer("sgd", optax.constant_schedule(1e-2))
        # fresh buffers: the jitted step donates its state, which would
        # otherwise delete the shared `variables` arrays on the first run
        vcopy = jax.tree_util.tree_map(jnp.array, variables)
        state = create_train_state(model, vcopy, tx)
        step = make_train_step(model, crop_hw=(16, 24),
                               scale_range=(0.9, 1.1), remat=remat)
        state, m = step(state, batch, key)
        outs.append((float(m["loss"]), state.params))
    assert np.isclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_packed_state_roundtrip_bit_exact():
    """StatePacker.pack/unpack must round-trip the full TrainState
    bit-exactly, including the non-float leaves (step, optimizer count) —
    unlike ravel_pytree it never casts across dtypes."""
    import optax

    from mspl_tpu.engine.packing import StatePacker

    model = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(model, (16, 24))
    tx = build_optimizer("sgd", optax.constant_schedule(1e-2))
    state = create_train_state(model, variables, tx)

    packer = StatePacker(state)
    assert packer.n_buffers <= 3  # f32 + int dtypes only
    packed = jax.jit(packer.pack)(state)
    assert sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x: x.size, packed))) == sum(
        jnp.asarray(l).size for l in jax.tree_util.tree_leaves(state))
    back = jax.jit(packer.unpack)(packed)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(back)):
        # python-scalar leaves (fresh TrainState.step = 0) canonicalize to
        # int32 arrays in the round trip; array leaves keep their dtype
        a, b = np.asarray(jnp.asarray(a)), np.asarray(b)
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_packed_train_step_matches_plain():
    """The packed-dispatch step (TrainLoopConfig.pack_dispatch) is the same
    program with pack/unpack fused in: identical loss, params, batch_stats,
    and eval confusion matrix after two steps."""
    import optax

    from mspl_tpu.engine.packing import StatePacker

    rng = np.random.RandomState(1)
    model = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(model, (16, 24))
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (4, 16, 24, 3)), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 3, (4, 16, 24)), jnp.int32),
        "valid": jnp.ones((4,), bool),
    }
    key = jax.random.PRNGKey(0)

    def run(packed: bool):
        tx = build_optimizer("sgd", optax.constant_schedule(1e-2))
        vcopy = jax.tree_util.tree_map(jnp.array, variables)
        state = create_train_state(model, vcopy, tx)
        packer = StatePacker(state) if packed else None
        step = make_train_step(model, crop_hw=(16, 24),
                               scale_range=(0.9, 1.1), packer=packer)
        losses = []
        if packed:
            state = jax.jit(packer.pack)(state)
        for i in range(2):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        if packed:
            state = jax.jit(packer.unpack)(state)
        estep = make_eval_step(model, 3)
        cm = np.asarray(estep(state.params, state.batch_stats, batch))
        return losses, state, cm

    (l0, s0, cm0), (l1, s1, cm1) = run(False), run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_array_equal(cm0, cm1)
    assert int(s1.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves((s0.params, s0.batch_stats)),
                    jax.tree_util.tree_leaves((s1.params, s1.batch_stats))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_packed_eval_step_matches_plain():
    import optax

    from mspl_tpu.engine.packing import StatePacker

    rng = np.random.RandomState(2)
    model = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(model, (16, 24))
    tx = build_optimizer("sgd", optax.constant_schedule(1e-2))
    state = create_train_state(model, variables, tx)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (4, 16, 24, 3)), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 3, (4, 16, 24)), jnp.int32),
    }
    plain = make_eval_step(model, 3)(state.params, state.batch_stats, batch)
    packer = StatePacker(state)
    packed = jax.jit(packer.pack)(state)
    viapack = make_eval_step(model, 3, packer=packer)(packed, None, batch)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(viapack))


@pytest.mark.slow  # ~3 min on 1 core: compiles 3 full train steps
def test_cm_decoder_step_matches_nhwc():
    """A full train step through the channel-major decoder (cm_decoder=True,
    with and without channel-major logits into the loss) matches the NHWC
    step: same loss, same updated params within fp32 reduction noise."""
    import optax

    from mspl_tpu.engine.train import (build_optimizer, create_train_state,
                                       make_train_step)
    from mspl_tpu.models import ESPNetv2Segmentation, init_model

    rng = np.random.RandomState(1)
    base = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(base, (16, 24))
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (4, 16, 24, 3)), jnp.uint8),
        "label": jnp.asarray(rng.randint(0, 3, (4, 16, 24)), jnp.int32),
        "valid": jnp.ones((4,), bool),
    }
    key = jax.random.PRNGKey(0)
    outs = []
    import dataclasses as dc
    for model in (base,
                  dc.replace(base, cm_decoder=True),
                  dc.replace(base, cm_decoder=True,
                             channel_major_logits=True)):
        tx = build_optimizer("sgd", optax.constant_schedule(1e-2))
        vcopy = jax.tree_util.tree_map(jnp.array, variables)
        state = create_train_state(model, vcopy, tx)
        step = make_train_step(model, crop_hw=(16, 24),
                               scale_range=(0.9, 1.1))
        state, m = step(state, batch, key)
        outs.append((float(m["loss"]), state.params))
    for loss, params in outs[1:]:
        assert np.isclose(outs[0][0], loss, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-6)
