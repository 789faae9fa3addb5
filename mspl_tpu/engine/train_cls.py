"""Classification pretraining engine (reference `model/classification/` +
EdgeNets-style ImageNet pretraining of the ESPNetv2 encoder, SURVEY.md §2
"ESPNetv2 classification backbone": the classification head exists to
pretrain the encoder that the segmentation model then loads).

Same TPU structure as the segmentation engine: one jitted step (normalize +
forward + CE + update), GSPMD DP over the `data` mesh axis, on-device
accuracy counters.  `encoder_variables_from_classifier` extracts the encoder
subtree so `ESPNetv2Segmentation` can start from pretrained weights — the
rebuild's analog of loading ImageNet `.pth` encoders (SURVEY.md §2
"Pretrained weights"; no downloads exist in this environment, SURVEY.md §7).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mspl_tpu.data.transforms import normalize
from mspl_tpu.engine.train import TrainState, build_optimizer, create_train_state
from mspl_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from mspl_tpu.utils.print_utils import print_log_message


def make_cls_train_step(model, mean=None, std=None, packer=None):
    """With ``packer`` (engine/packing.py) the state crosses dispatch as
    flat per-dtype buffers — see make_train_step's note; identical math."""
    norm_kw = {k: v for k, v in (("mean", mean), ("std", std)) if v is not None}

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        imgs = normalize(batch["image"], **norm_kw)
        labels = batch["label"]

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (acc, mutated)

        (loss, (acc, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": loss, "acc": acc}

    if packer is not None:
        def packed_step(packed, batch, rng):
            new_state, metrics = step(packer.unpack(packed), batch, rng)
            return packer.pack(new_state), metrics

        return jax.jit(packed_step, donate_argnums=0)

    return jax.jit(step, donate_argnums=0)


def make_cls_eval_step(model, mean=None, std=None, packer=None):
    norm_kw = {k: v for k, v in (("mean", mean), ("std", std)) if v is not None}

    def step(params, batch_stats, batch):
        if packer is not None:
            state = packer.unpack(params)
            params, batch_stats = state.params, state.batch_stats
        imgs = normalize(batch["image"], **norm_kw)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False)
        correct = ((jnp.argmax(logits, -1) == batch["label"])
                   & batch.get("valid", jnp.ones_like(batch["label"], bool)))
        return correct.sum(), batch.get(
            "valid", jnp.ones_like(batch["label"], bool)).sum()

    return jax.jit(step)


@dataclass
class ClsTrainConfig:
    epochs: int = 90
    lr: float = 0.1
    scheduler: str = "poly"
    optimizer: str = "sgd"
    momentum: float = 0.9
    weight_decay: float = 4e-5
    seed: int = 0
    verbose: bool = True


def train_classification(model, variables, train_loader, val_loader,
                         cfg: ClsTrainConfig, mesh=None) -> Dict[str, Any]:
    from mspl_tpu.engine.schedules import build_schedule

    mesh = mesh or make_mesh_for_batch(train_loader.batch_size)
    steps_per_epoch = max(len(train_loader), 1)
    schedule = build_schedule(cfg.scheduler, cfg.lr,
                              cfg.epochs * steps_per_epoch,
                              steps_per_epoch=steps_per_epoch)
    tx = build_optimizer(cfg.optimizer, schedule, cfg.momentum,
                         cfg.weight_decay)
    from mspl_tpu.engine.packing import StatePacker

    state = replicate(create_train_state(model, variables, tx), mesh)
    packer = StatePacker(state)
    train_step = make_cls_train_step(model, packer=packer)
    eval_step = make_cls_eval_step(model, packer=packer)
    state = jax.jit(packer.pack)(state)
    unpack = jax.jit(packer.unpack)

    rng = jax.random.PRNGKey(cfg.seed)
    history = []
    best_acc = -1.0
    for epoch in range(cfg.epochs):
        losses = []
        for batch in train_loader:
            batch = shard_batch(batch, mesh)
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, batch, sub)
            losses.append(m["loss"])
        loss = float(np.mean([jax.device_get(l) for l in losses])) if losses else 0.0

        acc = None
        if val_loader is not None:
            num, den = 0, 0
            for batch in val_loader:
                batch = shard_batch(batch, mesh)
                c, t = eval_step(state, None, batch)
                num += int(c)
                den += int(t)
            acc = num / max(den, 1)
            best_acc = max(best_acc, acc)
        history.append({"epoch": epoch, "loss": loss, "acc": acc})
        if cfg.verbose:
            print_log_message(
                f"cls epoch {epoch}: loss {loss:.4f}"
                + (f" val acc {acc:.4f}" if acc is not None else ""))
    return {"state": unpack(state), "history": history, "best_acc": best_acc}


def encoder_variables_from_classifier(cls_variables: Dict) -> Dict:
    """Extract the encoder subtree of a trained EESPNet classifier in the
    naming the segmentation model expects under `base_net` (levels 1-4)."""
    enc_prefixes = ("level1", "level2_0", "level3_0", "level3_blocks",
                    "level4_0", "level4_blocks")

    def filter_tree(tree):
        return {k: v for k, v in tree.items()
                if any(k == p or k.startswith(p + "_") for p in enc_prefixes)}

    return {
        "params": filter_tree(cls_variables["params"]),
        "batch_stats": filter_tree(cls_variables.get("batch_stats", {})),
    }


def load_pretrained_encoder(seg_variables: Dict, cls_variables: Dict) -> Dict:
    """Copy a pretrained classifier's encoder into a segmentation model's
    `base_net` subtree; returns updated segmentation variables."""
    enc = encoder_variables_from_classifier(cls_variables)
    out = jax.tree_util.tree_map(lambda x: x, seg_variables)  # shallow copy

    for col in ("params", "batch_stats"):
        base = dict(out[col]["base_net"])
        for k, v in enc[col].items():
            if k in base:
                base[k] = v
        new_col = dict(out[col])
        new_col["base_net"] = base
        out[col] = new_col
    return out
