"""Train/eval engine (reference `utilities/train_eval_seg.py` + train-script
loops, SURVEY.md §2 "Train/eval engine", §3.1 call stack).

TPU-native structure:

* ONE jitted train step containing the whole hot path — device-side
  augmentation (`train_transform`), forward, loss, backward, optimizer
  update, BN-stat update — so XLA fuses augmentation into the step and the
  host only feeds uint8 batches (SURVEY.md §3.1 hot loop, rebuilt);
* GSPMD data parallelism: batches sharded over the mesh `data` axis,
  state replicated; gradient all-reduce and global BN statistics are
  XLA-inserted `psum`s over ICI (SURVEY.md §2 parallelism table);
* eval step returns a device-side confusion matrix; only [C,C] floats cross
  to the host per batch (SURVEY.md §5 metrics row).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from mspl_tpu.data.transforms import normalize, train_transform
from mspl_tpu.engine.losses import segmentation_loss
from mspl_tpu.engine.metrics import MIOU, confusion_matrix
from mspl_tpu.engine.packing import StatePacker
from mspl_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from mspl_tpu.utils.checkpoint import has_checkpoint, load_checkpoint, save_checkpoint
from mspl_tpu.utils.print_utils import print_info_message, print_log_message
from mspl_tpu.utils.tb_logger import ScalarLogger


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def build_optimizer(
    name: str,
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 4e-5,
) -> optax.GradientTransformation:
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=False),
        )
    elif name == "adam":
        tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    return tx


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def make_train_step(
    model,
    crop_hw: Optional[Tuple[int, int]] = None,
    scale_range: Tuple[float, float] = (0.5, 2.0),
    class_weights: Optional[np.ndarray] = None,
    reg_mode: str = "none",
    reg_weight: float = 0.0,
    augment: bool = True,
    mean=None,
    std=None,
    remat: bool = False,
    bn_groups: int = 1,
    donate: bool = True,
    packer: Optional[StatePacker] = None,
):
    """Returns jitted (state, batch, rng) -> (state, metrics) train step.

    ``packer``: when given (a `StatePacker` built from the example state),
    the returned step instead maps (packed_state, batch, rng) ->
    (packed_state, metrics), with the state crossing the dispatch boundary
    as one flat buffer per dtype (~3 leaves instead of ~756) and
    unpack/repack fused into the jitted program.  This removes the
    per-buffer dispatch overhead that dominated the step's wall time on
    the remote-TPU runtime (see `engine/packing.py`); the math is
    identical.

    ``remat=True`` wraps the forward in ``jax.checkpoint`` so the backward
    recomputes activations instead of holding them in HBM — the standard
    TPU trade of FLOPs for memory when batch x crop would otherwise OOM.

    ``bn_groups > 1`` computes BatchNorm batch statistics per contiguous
    batch group instead of over the global batch (unsynced/per-replica BN,
    SURVEY.md §7 "BN under pmap"); set it to the data-shard count to match
    the reference's torch-DataParallel semantics.  See
    ``mspl_tpu/layers/bn.py``.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights)
    norm_kw = {}
    if mean is not None:
        norm_kw["mean"] = mean
    if std is not None:
        norm_kw["std"] = std

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        imgs8, labels = batch["image"], batch["label"]
        if augment:
            imgs, labels = train_transform(
                imgs8, labels, crop_hw, rng, scale_range, **norm_kw
            )
        else:
            imgs = normalize(imgs8, **norm_kw)

        def fwd(params, imgs):
            from mspl_tpu.layers.bn import bn_stat_groups

            with bn_stat_groups(bn_groups):
                return state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(rng, 1)},
                )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            out, mutated = fwd(params, imgs)
            # channel_major_logits models emit [B, C, H, W] in train too
            # (natively under cm_decoder); the loss consumes that layout
            # directly instead of forcing an exit transpose pair
            loss = segmentation_loss(
                out, labels, class_weights=cw,
                reg_mode=reg_mode, reg_weight=reg_weight,
                batch_mask=batch.get("valid"),
                channel_axis=(1 if getattr(model, "channel_major_logits",
                                           False) else -1),
            )
            return loss, (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        metrics = {"loss": loss}
        return state, metrics

    if packer is not None:
        def packed_step(packed: Dict, batch: Dict, rng: jax.Array):
            new_state, metrics = step(packer.unpack(packed), batch, rng)
            return packer.pack(new_state), metrics

        return jax.jit(packed_step, donate_argnums=0 if donate else ())

    # donate=False exists for tooling: the axon profiler errors on programs
    # with donated/aliased buffers (tools/tpu_profile.py)
    return jax.jit(step, donate_argnums=0 if donate else ())


def make_eval_step(model, num_classes: int, mean=None, std=None,
                   packer: Optional[StatePacker] = None):
    """Returns jitted (params, batch_stats, batch) -> confusion matrix [C,C].

    With ``packer``, the first argument is instead the PACKED train state
    (`batch_stats` is ignored — it lives inside the packed state); the
    call signature stays 3-ary so `evaluate` drives both forms.
    """
    norm_kw = {}
    if mean is not None:
        norm_kw["mean"] = mean
    if std is not None:
        norm_kw["std"] = std

    def step(params, batch_stats, batch):
        if packer is not None:
            state = packer.unpack(params)
            params, batch_stats = state.params, state.batch_stats
        imgs = normalize(batch["image"], **norm_kw)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False
        )
        pred = jnp.argmax(
            out, axis=1 if getattr(model, "channel_major_logits", False)
            else -1)
        return confusion_matrix(
            pred, batch["label"], num_classes, batch_mask=batch.get("valid")
        )

    return jax.jit(step)


def evaluate(
    eval_step,
    state_or_params,
    batch_stats,
    loader,
    num_classes: int,
    mesh=None,
) -> Tuple[np.ndarray, float]:
    """Run the eval loop; returns (per-class IoU, mIoU)."""
    miou = MIOU(num_classes)
    params = getattr(state_or_params, "params", state_or_params)
    for batch in loader:
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        miou.update(eval_step(params, batch_stats, batch))
    return miou.get_iou()


@dataclass
class TrainLoopConfig:
    epochs: int = 50
    crop_hw: Tuple[int, int] = (256, 256)
    scale_range: Tuple[float, float] = (0.5, 2.0)
    lr: float = 0.009
    scheduler: str = "hybrid"
    optimizer: str = "sgd"
    momentum: float = 0.9
    weight_decay: float = 4e-5
    reg_mode: str = "none"
    reg_weight: float = 0.0
    seed: int = 0
    ckpt_dir: Optional[str] = None
    log_dir: Optional[str] = None
    resume: bool = False
    eval_every: int = 1
    augment: bool = True
    remat: bool = False
    verbose: bool = True
    # preemption-grade checkpointing (SURVEY.md §5 failure-recovery row:
    # "Checkpoint-every-N-steps + auto-resume"): 0 = per-epoch only
    ckpt_every_steps: int = 0
    # hard stop after N optimizer steps (test hook for kill-and-resume;
    # also useful for step-bounded jobs)
    max_steps: Optional[int] = None
    # BN statistics scope: 1 = global-batch (synced, default); N>1 = per
    # contiguous batch group (unsynced / per-replica semantics)
    bn_groups: int = 1
    # thread the state through dispatch as flat per-dtype buffers
    # (engine/packing.py); identical math, off switch for debugging only
    pack_dispatch: bool = True


def train_segmentation(
    model,
    variables,
    train_loader,
    val_loader,
    num_classes: int,
    cfg: TrainLoopConfig,
    class_weights: Optional[np.ndarray] = None,
    mesh=None,
) -> Dict[str, Any]:
    """Full training loop: per-epoch train + val mIoU + best checkpointing
    (reference §3.1).  Returns {'state', 'best_miou', 'history'}."""
    from mspl_tpu.engine.schedules import build_schedule

    mesh = mesh or make_mesh_for_batch(train_loader.batch_size)
    steps_per_epoch = max(len(train_loader), 1)
    total_steps = cfg.epochs * steps_per_epoch
    schedule = build_schedule(
        cfg.scheduler, cfg.lr, total_steps, steps_per_epoch=steps_per_epoch
    )
    tx = build_optimizer(cfg.optimizer, schedule, cfg.momentum, cfg.weight_decay)
    state = create_train_state(model, variables, tx)

    start_epoch, start_step_in_epoch, best_miou = 0, 0, -1.0
    if cfg.resume and cfg.ckpt_dir and has_checkpoint(cfg.ckpt_dir):
        state, meta = load_checkpoint(cfg.ckpt_dir, state)
        ck_epoch = int(meta.get("epoch", 0))
        sie = int(meta.get("step_in_epoch", 0))
        best_miou = float(meta.get("best_miou", -1.0))
        if 0 < sie < steps_per_epoch:
            # mid-epoch (preemption) checkpoint: re-enter the same epoch at
            # the recorded batch; the loader order is a pure function of
            # seed+epoch so the remaining sequence is identical
            start_epoch, start_step_in_epoch = ck_epoch, sie
            print_info_message(f"resumed mid-epoch {ck_epoch} at step {sie}, "
                               f"best mIoU {best_miou:.4f}")
        else:
            start_epoch = ck_epoch + 1
            print_info_message(f"resumed from epoch {ck_epoch}, "
                               f"best mIoU {best_miou:.4f}")

    state = replicate(state, mesh)
    packer = StatePacker(state) if cfg.pack_dispatch else None
    train_step = make_train_step(
        model, crop_hw=cfg.crop_hw, scale_range=cfg.scale_range,
        class_weights=class_weights, reg_mode=cfg.reg_mode,
        reg_weight=cfg.reg_weight, augment=cfg.augment, remat=cfg.remat,
        bn_groups=cfg.bn_groups, packer=packer,
    )
    eval_step = make_eval_step(model, num_classes, packer=packer)
    if packer is not None:
        unpack = jax.jit(packer.unpack)
        state = jax.jit(packer.pack)(state)
    else:
        unpack = lambda s: s  # noqa: E731
    logger = ScalarLogger(cfg.log_dir)
    # per-step rng is fold_in(base, global_step): a resumed process
    # reproduces the uninterrupted run's augmentation stream exactly
    rng = jax.random.PRNGKey(cfg.seed)
    history = []
    stopped = False

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        losses = []
        # pin the loader's epoch so shuffle order survives resume (the
        # counter otherwise restarts at 0 in a fresh process)
        train_loader.epoch = epoch
        skip = start_step_in_epoch if epoch == start_epoch else 0
        batches = (train_loader.iter_batches(skip)
                   if hasattr(train_loader, "iter_batches")
                   else train_loader)
        for b, batch in enumerate(batches, start=skip):
            step_i = epoch * steps_per_epoch + b
            batch = shard_batch(batch, mesh)
            sub = jax.random.fold_in(rng, step_i)
            state, metrics = train_step(state, batch, sub)
            losses.append(metrics["loss"])
            done_in_epoch = b + 1
            if (cfg.ckpt_every_steps and cfg.ckpt_dir
                    and done_in_epoch < steps_per_epoch
                    and done_in_epoch % cfg.ckpt_every_steps == 0):
                save_checkpoint(
                    cfg.ckpt_dir, unpack(state),
                    {"epoch": epoch, "step_in_epoch": done_in_epoch,
                     "best_miou": best_miou})
            if cfg.max_steps is not None and step_i + 1 >= cfg.max_steps:
                stopped = True
                break
        if stopped:
            break
        mean_loss = float(np.mean([jax.device_get(l) for l in losses])) if losses else 0.0
        lr_now = float(schedule((epoch + 1) * steps_per_epoch))
        logger.add_scalar("train/loss", mean_loss, epoch)
        logger.add_scalar("train/lr", lr_now, epoch)

        miou = None
        if val_loader is not None and (epoch + 1) % cfg.eval_every == 0:
            bs = None if packer is not None else state.batch_stats
            _, miou = evaluate(eval_step, state, bs, val_loader,
                               num_classes, mesh)
            logger.add_scalar("val/miou", miou, epoch)

        is_best = miou is not None and miou > best_miou
        if is_best:
            best_miou = miou
        if cfg.ckpt_dir:
            save_checkpoint(
                cfg.ckpt_dir, unpack(state),
                {"epoch": epoch, "best_miou": best_miou,
                 "miou": miou if miou is not None else -1.0},
                is_best=is_best,
            )
        history.append({"epoch": epoch, "loss": mean_loss, "miou": miou,
                        "lr": lr_now, "sec": time.time() - t0})
        if cfg.verbose:
            print_log_message(
                f"epoch {epoch}: loss {mean_loss:.4f} lr {lr_now:.5f}"
                + (f" val mIoU {miou:.4f}{' *' if is_best else ''}" if miou is not None else "")
            )

    logger.close()
    return {"state": unpack(state), "best_miou": best_miou,
            "history": history}
