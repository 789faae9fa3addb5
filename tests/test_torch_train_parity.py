"""TRAJECTORY parity vs the torch oracle (VERDICT r3 item 5): same init
(weight transplant), same synthetic batches, same SGD/momentum/weight-decay/
poly-schedule semantics, N SGD steps trained in torch-CPU and in the flax
engine — per-step losses must agree within an fp32 drift envelope and the
loss CURVES must stay statistically identical.

What this covers that the single-forward transplant gate
(tests/test_torch_e2e_parity.py) cannot: train-mode BatchNorm batch-stat
normalization + running-stat EMA, gradient flow through every layer, torch
SGD's exact update order (grad + wd*p -> momentum buffer -> step), the loss
reduction, and the lr schedule hookup.

Calibration facts (tools/exp_traj_dump.py, this host, 2026-08-20): the two
trajectories agree to ~2e-6 rel at step 0 and ~1e-5..1e-4 through step 4,
then fp32 reduction-order noise amplifies chaotically through the sharp
early-training landscape (rel diff ~5e-3 by step 8, a few % by step 19;
final per-pixel argmax agreement 0.73 at lr=0.005).  Two runs of the SAME
framework with a 1-ulp perturbation decorrelate the same way, so the gate
asserts a tight envelope on the early steps (pure semantics), a bounded
aggregate divergence over the curve, and end-state agreement at the
statistics level (loss/mIoU), not bitwise weights.

Known benign semantic gap: torch updates running_var with the UNBIASED
batch variance, flax with the biased one — factor n/(n-1) ~ 1+2e-4 at this
pixel count, far inside every tolerance used here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mspl_tpu.data.loader import DataLoader
from mspl_tpu.data.datasets import SyntheticSegmentation
from mspl_tpu.data.transforms import normalize as jnormalize
from mspl_tpu.engine.losses import segmentation_loss
from mspl_tpu.engine.metrics import MIOU, confusion_matrix
from mspl_tpu.engine.schedules import build_schedule
from mspl_tpu.engine.train import (
    build_optimizer,
    create_train_state,
    make_train_step,
)
from mspl_tpu.models import ESPNetv2Segmentation, init_model
from mspl_tpu.oracle.torch_espnetv2 import (
    TESPNetv2Segmentation,
    load_from_flax,
)
from mspl_tpu.utils.registry import IMAGENET_MEAN, IMAGENET_STD

STEPS = 20
LR = 0.005  # calibrated: lr=0.02 decorrelates ~2 steps sooner
MOMENTUM = 0.9
WD = 4e-5
HW = (32, 48)
BATCH = 4
CLASSES = 4


def _normalize_np(img_u8: np.ndarray) -> np.ndarray:
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (img_u8.astype(np.float32) / 255.0 - mean) / std


def _batches(n, seed=0, length=16):
    ds = SyntheticSegmentation(num_classes=CLASSES, size_wh=HW[::-1],
                               length=length, seed=seed)
    loader = DataLoader(ds, batch_size=BATCH, shuffle=True, seed=seed)
    out = []
    while len(out) < n:
        for b in loader:
            out.append({"image": np.asarray(b["image"]),
                        "label": np.asarray(b["label"]).astype(np.int64)})
            if len(out) == n:
                break
        loader.epoch = getattr(loader, "epoch", 0) + 1
    return out


def _twins():
    model = ESPNetv2Segmentation(num_classes=CLASSES, s=0.5,
                                 dec_base_planes=8)
    variables = init_model(model, HW)
    tmodel = TESPNetv2Segmentation(num_classes=CLASSES, s=0.5,
                                   dec_base_planes=8)
    load_from_flax(tmodel, variables)
    return model, variables, tmodel


@pytest.mark.slow  # ~2 min on 1 core: full fwd+bwd in torch AND flax
def test_gradient_parity_at_init():
    """Direct, chaos-free semantics gate: at the transplanted init, the CE
    loss AND the global gradient norm (over all trainable params, train-mode
    BN) must match torch's backward to fp32 accuracy.  Any wrong VJP in any
    layer would shift the global norm."""
    model, variables, tmodel = _twins()
    tmodel.train()
    batch = _batches(1)[0]

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnormalize(jnp.asarray(batch["image"])), train=True,
            mutable=["batch_stats"])
        return segmentation_loss(out, jnp.asarray(
            batch["label"].astype(np.int32)))

    floss, fgrads = jax.value_and_grad(loss_fn)(variables["params"])
    fnorm = float(optax_global_norm(fgrads))

    x = torch.from_numpy(_normalize_np(batch["image"])).permute(0, 3, 1, 2)
    y = torch.from_numpy(batch["label"])
    tloss = F.cross_entropy(tmodel(x), y, ignore_index=255)
    tloss.backward()
    tnorm = float(torch.sqrt(sum(
        (p.grad ** 2).sum() for p in tmodel.parameters()
        if p.grad is not None)))

    assert abs(float(floss) - float(tloss)) / float(tloss) < 1e-4
    assert abs(fnorm - tnorm) / tnorm < 1e-3, (fnorm, tnorm)


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                        for x in jax.tree_util.tree_leaves(tree)))


@pytest.mark.slow  # ~1.5 min on 1 core: 20 SGD steps in both stacks
def test_sgd_trajectory_parity():
    model, variables, tmodel = _twins()
    tmodel.train()

    schedule = build_schedule("poly", LR, STEPS)
    tx = build_optimizer("sgd", schedule, MOMENTUM, WD)
    state = create_train_state(model, variables, tx)
    # augment=False: torch/JAX PRNG streams cannot be bit-matched, so the
    # trajectory gate runs the normalize-only path; augmentation math has
    # its own per-op tests (tests/test_data.py)
    train_step = make_train_step(model, augment=False, donate=False)

    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WD)

    batches = _batches(STEPS)
    flax_losses, torch_losses = [], []
    rng = jax.random.PRNGKey(7)
    for i, batch in enumerate(batches):
        jb = {"image": jnp.asarray(batch["image"]),
              "label": jnp.asarray(batch["label"].astype(np.int32))}
        state, metrics = train_step(state, jb, jax.random.fold_in(rng, i))
        flax_losses.append(float(metrics["loss"]))

        for g in opt.param_groups:  # identical poly schedule, same index
            g["lr"] = float(schedule(i))
        x = torch.from_numpy(
            _normalize_np(batch["image"])).permute(0, 3, 1, 2)
        y = torch.from_numpy(batch["label"])
        opt.zero_grad()
        loss = F.cross_entropy(tmodel(x), y, ignore_index=255)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    f = np.asarray(flax_losses)
    t = np.asarray(torch_losses)
    rel = np.abs(f - t) / t
    # drift envelope (see module docstring for the calibration data; each
    # bound carries ~4-10x margin over the measured drift on this host)
    assert rel[0] < 1e-4, f"step-0 loss mismatch: {rel[0]:.2e}"
    assert rel[1] < 1e-3, f"step-1 (first update) mismatch: {rel[1]:.2e}"
    assert rel[:5].max() < 5e-3, f"early-step drift: {rel[:5].max():.2e}"
    assert rel[:9].max() < 5e-2, f"mid drift: {rel[:9].max():.2e}"
    assert rel.max() < 2e-1, f"late drift: {rel.max():.2e}"
    assert rel.mean() < 5e-2, f"curve divergence: {rel.mean():.2e}"
    # the curves end in the same place: both trained, equally far
    assert abs(f[-5:].mean() - t[-5:].mean()) / t[-5:].mean() < 7e-2

    # end-state agreement at the statistics level on a held-out batch
    val = _batches(1, seed=99)[0]
    tmodel.eval()
    with torch.no_grad():
        tlog = tmodel(torch.from_numpy(
            _normalize_np(val["image"])).permute(0, 3, 1, 2))
    tpred = tlog.argmax(1).numpy()
    flog = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnormalize(jnp.asarray(val["image"])), train=False))
    fpred = flog.argmax(-1)
    agree = (fpred == tpred).mean()
    assert agree > 0.55, f"post-training argmax agreement {agree}"

    labels = jnp.asarray(val["label"].astype(np.int32))
    fmiou = MIOU(CLASSES)
    fmiou.update(confusion_matrix(jnp.asarray(fpred), labels, CLASSES))
    tmiou = MIOU(CLASSES)
    tmiou.update(confusion_matrix(jnp.asarray(tpred), labels, CLASSES))
    dm = abs(fmiou.get_iou()[1] - tmiou.get_iou()[1])
    assert dm < 0.2, f"post-training mIoU gap {dm:.3f}"
