"""One-off: dump the flax-vs-torch SGD trajectories + final agreement to
calibrate the trajectory-parity test tolerances (tests/
test_torch_train_parity.py).  Run on CPU: JAX_PLATFORMS=cpu python
tools/exp_traj_dump.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from tests.test_torch_train_parity import (
    BATCH, CLASSES, HW, LR, MOMENTUM, STEPS, WD, _batches, _normalize_np)
from mspl_tpu.engine.schedules import build_schedule
from mspl_tpu.engine.train import build_optimizer, create_train_state, \
    make_train_step
from mspl_tpu.models import ESPNetv2Segmentation, init_model
from mspl_tpu.oracle.torch_espnetv2 import TESPNetv2Segmentation, \
    load_from_flax
from mspl_tpu.data.transforms import normalize as jnormalize


def run(lr):
    model = ESPNetv2Segmentation(num_classes=CLASSES, s=0.5,
                                 dec_base_planes=8)
    variables = init_model(model, HW)
    tmodel = TESPNetv2Segmentation(num_classes=CLASSES, s=0.5,
                                   dec_base_planes=8)
    load_from_flax(tmodel, variables)
    tmodel.train()
    schedule = build_schedule("poly", lr, STEPS)
    tx = build_optimizer("sgd", schedule, MOMENTUM, WD)
    state = create_train_state(model, variables, tx)
    train_step = make_train_step(model, augment=False, donate=False)
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=MOMENTUM,
                          weight_decay=WD)
    batches = _batches(STEPS)
    rng = jax.random.PRNGKey(7)
    print(f"lr={lr}")
    for i, batch in enumerate(batches):
        jb = {"image": jnp.asarray(batch["image"]),
              "label": jnp.asarray(batch["label"].astype(np.int32))}
        state, metrics = train_step(state, jb, jax.random.fold_in(rng, i))
        fl = float(metrics["loss"])
        for g in opt.param_groups:
            g["lr"] = float(schedule(i))
        x = torch.from_numpy(_normalize_np(batch["image"])).permute(0, 3, 1, 2)
        y = torch.from_numpy(batch["label"])
        opt.zero_grad()
        logits = tmodel(x)
        loss = F.cross_entropy(logits, y, ignore_index=255)
        loss.backward()
        opt.step()
        tl = float(loss.detach())
        print(f"  step {i:2d}: flax {fl:.6f} torch {tl:.6f} "
              f"absdiff {abs(fl - tl):.2e} reldiff {abs(fl - tl) / tl:.2e}")

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
    print(f"  final argmax agreement: {(fpred == tpred).mean():.4f}")
    print(f"  final logits max abs diff: "
          f"{np.abs(flog - tlog.permute(0, 2, 3, 1).numpy()).max():.4f}")


for lr in (0.02, 0.005):
    run(lr)
