"""Command-line orchestration (reference layer L6, SURVEY.md §1: top-level
argparse scripts per workload; §3 call stacks).  One CLI with subcommands
that mirror the reference's script surface and flag names:

  train      — source/target segmentation training        (§3.1)
  eval       — inference + per-class IoU table            (§3.4, config #1)
  pseudo     — single/multi-source pseudo-label generation (§3.2, configs #2/#3)
  selftrain  — multi-round MSPL curriculum                 (§3.3, configs #4/#5)
  bench      — headline throughput benchmark

Model checkpoints are saved with a JSON meta ({dataset, model, s,
num_classes}) so downstream commands can rebuild the network without
repeating flags.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, Optional, Tuple

import numpy as np

from mspl_tpu.utils.print_utils import print_info_message, \
    print_warning_message
from mspl_tpu.utils.registry import (
    CONF_MODES,
    FUSION_MODES,
    MODEL_NAMES,
    SCHEDULER_NAMES,
    SEGMENTATION_DATASETS,
    dataset_info,
)

MODEL_CKPT = "model_best"


def _save_model(ckpt_dir: str, variables: Dict, meta: Dict) -> None:
    from mspl_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(ckpt_dir, variables, meta, name=MODEL_CKPT)


def _is_torch_ckpt(path: str) -> bool:
    return path.endswith((".pth", ".pt", ".pth.tar"))


def _meta_stem(path: str) -> str:
    for suf in (".pth.tar", ".pth", ".pt"):
        if path.endswith(suf):
            return path[: -len(suf)]
    return os.path.splitext(path)[0]


def load_model_checkpoint(path_or_dir: str) -> Tuple[Any, Dict, Dict]:
    """Load a model checkpoint saved by `train`; rebuild the model from its
    meta.  Returns (model, variables, meta)."""
    import jax.numpy as jnp

    from mspl_tpu.models import build_segmentation_model, init_model
    from mspl_tpu.utils.checkpoint import load_checkpoint

    if os.path.isdir(path_or_dir):
        path = os.path.join(path_or_dir, MODEL_CKPT + ".msgpack")
    else:
        path = path_or_dir
    if _is_torch_ckpt(path):
        # torch .pth with the same-stem JSON meta sidecar the native format
        # uses (utils/torch_import.py; `import-torch` writes a native dir
        # instead, so this direct path is for ad-hoc use)
        from mspl_tpu.utils.torch_import import import_torch_checkpoint

        with open(_meta_stem(path) + ".json") as f:
            meta = json.load(f)
        model, variables, _ = import_torch_checkpoint(path, meta)
        return model, variables, meta
    with open(os.path.splitext(path)[0] + ".json") as f:
        meta = json.load(f)
    model = build_segmentation_model(
        meta["model"], num_classes=meta["num_classes"], s=meta.get("s", 2.0),
        compute_dtype=jnp.bfloat16 if meta.get("bf16", False) else jnp.float32,
        **_arch_meta_kw(meta),
    )
    info = dataset_info(meta["dataset"]) if meta.get("dataset") in SEGMENTATION_DATASETS else None
    hw = meta.get("input_hw") or (
        (info.size_wh[1], info.size_wh[0]) if info else (256, 480))
    target = init_model(model, tuple(hw),
                        channels=int(meta.get("in_channels", 3)))
    variables, _ = load_checkpoint(path, target)
    return model, variables, meta


def _arch_meta_kw(meta) -> Dict:
    """Architecture-shaping kwargs carried in a checkpoint meta (deeplabv3
    stage_blocks/aspp_features, espnetv2 dec_base_planes) — honored on
    EVERY rebuild-from-meta path, not just the torch import (r5 review:
    a native checkpoint of a non-default architecture otherwise restores
    into the wrong model)."""
    from mspl_tpu.utils.torch_import import _ARCH_META_KEYS

    return {k: (tuple(meta[k]) if isinstance(meta[k], list) else meta[k])
            for k in _ARCH_META_KEYS.get(meta.get("model"), ())
            if k in meta}


def _print_model_card(model, variables, shape_hw, channels: int = 3) -> None:
    """Build-time model card (the reference prints FLOPs/params at model
    build — SURVEY.md §5 'Tracing / profiling')."""
    import jax.numpy as jnp

    from mspl_tpu.utils.profiling import estimate_flops, model_parameters

    n_params = model_parameters(variables["params"])
    flops = estimate_flops(
        lambda v, x: model.apply(v, x, train=False),
        variables, jnp.zeros((1, *shape_hw, channels), jnp.float32))
    msg = f"model: {n_params / 1e6:.3f} M params"
    if flops:
        msg += f", {flops / 1e9:.3f} GFLOPs @ {shape_hw[1]}x{shape_hw[0]}"
    print_info_message(msg)


def _cm_decoder_kw(args) -> dict:
    """--cm-decoder -> model kwargs (espnetv2-only; the channel-major BN
    path normalizes on axis 1, which the grouped unsynced-BN mode does not
    support — layers/bn.py)."""
    if not getattr(args, "cm_decoder", False):
        return {}
    if args.model != "espnetv2":
        raise SystemExit("--cm-decoder is espnetv2-only")
    if getattr(args, "bn_groups", 1) > 1:
        raise SystemExit("--cm-decoder is incompatible with --bn-groups > 1")
    return {"cm_decoder": True}


def _add_common_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="espnetv2", choices=MODEL_NAMES)
    p.add_argument("--s", type=float, default=2.0, help="ESPNetv2 width scaler")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop-size", type=int, nargs=2, default=None,
                   metavar=("W", "H"))
    p.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("W", "H"),
                   help="override the dataset's canonical image size")
    p.add_argument("--lr", type=float, default=0.009)
    p.add_argument("--scheduler", default="hybrid", choices=SCHEDULER_NAMES)
    p.add_argument("--optimizer", default="sgd", choices=("sgd", "adam"))
    p.add_argument("--weight-decay", type=float, default=4e-5)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--bf16", action="store_true",
                   help="run the conv stack in bfloat16")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations in the backward "
                        "(jax.checkpoint) to fit larger batch x crop in HBM")
    p.add_argument("--cm-decoder", action="store_true",
                   help="run the espnetv2 TRAIN decoder channel-major "
                        "([B,C,H,W]; ops/cm_ops.py) — removes the layout "
                        "flips XLA inserts around its lane-starved NHWC "
                        "convs; eval is unaffected and checkpoints are "
                        "layout-interchangeable")
    p.add_argument("--bn-groups", type=int, default=1,
                   help="BatchNorm statistics scope: 1 = global batch "
                        "(synced, default); N>1 = per contiguous batch group "
                        "(unsynced/per-replica BN; set to the data-shard "
                        "count to match torch-DataParallel semantics)")
    p.add_argument("--rgbd", action="store_true",
                   help="greenhouse RGB-D: lists are 'rgb depth [label]', "
                        "the model stem takes 4 channels")
    p.add_argument("--ckpt-dir", default="./runs/ckpt")
    p.add_argument("--ckpt-every-steps", type=int, default=0,
                   help="also checkpoint every N optimizer steps mid-epoch "
                        "(preemption-grade; --resume re-enters the epoch at "
                        "the exact step)")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)


def cmd_train(args) -> Dict:
    import jax.numpy as jnp

    from mspl_tpu.data.datasets import build_dataset
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.engine.losses import compute_class_weights
    from mspl_tpu.engine.train import TrainLoopConfig, train_segmentation
    from mspl_tpu.models import build_segmentation_model, init_model

    info = dataset_info(args.dataset)
    size_wh = tuple(args.size) if args.size else None
    use_depth = getattr(args, "rgbd", False)
    train_ds = build_dataset(args.dataset, args.data_root, args.train_list,
                             size_wh=size_wh, use_depth=use_depth)
    val_ds = (build_dataset(args.dataset, args.data_root, args.val_list,
                            size_wh=size_wh, use_depth=use_depth)
              if args.val_list else None)
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              seed=args.seed)
    val_loader = DataLoader(val_ds, args.batch_size) if val_ds else None

    crop_wh = args.crop_size or size_wh or info.size_wh
    crop_hw = (crop_wh[1], crop_wh[0])
    model = build_segmentation_model(
        args.model, num_classes=info.num_classes, s=args.s,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        **_cm_decoder_kw(args),
    )
    in_ch = getattr(train_ds, "channels", 3)
    variables = init_model(model, train_ds.shape_hw, channels=in_ch)
    _print_model_card(model, variables, train_ds.shape_hw, channels=in_ch)

    if getattr(args, "pretrained_encoder", None):
        from mspl_tpu.engine.train_cls import load_pretrained_encoder
        from mspl_tpu.models import EESPNet
        from mspl_tpu.utils.checkpoint import load_checkpoint

        pe = args.pretrained_encoder
        path = (os.path.join(pe, MODEL_CKPT + ".msgpack")
                if os.path.isdir(pe) else pe)
        with open(os.path.splitext(path)[0] + ".json") as f:
            pmeta = json.load(f)
        cls_model = EESPNet(s=pmeta.get("s", 2.0),
                            num_classes=pmeta["num_classes"])
        from mspl_tpu.models import init_model as _init
        cls_target = _init(cls_model, tuple(pmeta.get("input_hw", (224, 224))))
        cls_vars, _ = load_checkpoint(path, cls_target)
        variables = load_pretrained_encoder(variables, cls_vars)
        print_info_message(f"initialized encoder from {pe}")

    class_weights = None
    if args.class_weighting:
        hist = np.zeros(info.num_classes, np.int64)
        for i in range(min(len(train_ds), 200)):
            _, lab = train_ds.load(i)
            h, _ = np.histogram(lab[lab != 255], bins=info.num_classes,
                                range=(0, info.num_classes))
            hist += h
        class_weights = compute_class_weights(hist)

    cfg = TrainLoopConfig(
        epochs=args.epochs, crop_hw=crop_hw, lr=args.lr,
        scheduler=args.scheduler, optimizer=args.optimizer,
        weight_decay=args.weight_decay, seed=args.seed,
        ckpt_dir=args.ckpt_dir, log_dir=args.log_dir, resume=args.resume,
        remat=getattr(args, "remat", False),
        ckpt_every_steps=getattr(args, "ckpt_every_steps", 0),
        bn_groups=getattr(args, "bn_groups", 1),
    )
    res = train_segmentation(model, variables, train_loader, val_loader,
                             info.num_classes, cfg,
                             class_weights=class_weights)
    import jax

    state = jax.device_get(res["state"])
    _save_model(
        args.ckpt_dir,
        {"params": state.params, "batch_stats": state.batch_stats},
        {"dataset": args.dataset, "model": args.model, "s": args.s,
         "num_classes": info.num_classes, "bf16": args.bf16,
         "input_hw": list(train_ds.shape_hw), "in_channels": in_ch,
         "best_miou": res["best_miou"]},
    )
    print_info_message(f"train done; best val mIoU {res['best_miou']:.4f}")
    return res


def cmd_pretrain(args) -> Dict:
    """Classification pretraining of the ESPNetv2 encoder (the reference's
    ImageNet-pretrained-encoder workflow, SURVEY.md §2 'Pretrained
    weights'); the saved checkpoint feeds `train --pretrained-encoder`."""
    import jax
    import jax.numpy as jnp

    from mspl_tpu.data.datasets import ClassificationListDataset
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.engine.train_cls import ClsTrainConfig, train_classification
    from mspl_tpu.models import EESPNet, init_model

    size_wh = tuple(args.size) if args.size else (224, 224)
    train_ds = ClassificationListDataset(args.data_root, args.train_list,
                                         size_wh=size_wh)
    val_ds = (ClassificationListDataset(args.data_root, args.val_list,
                                        size_wh=size_wh)
              if args.val_list else None)
    num_classes = max(train_ds.num_classes,
                      val_ds.num_classes if val_ds else 0)
    model = EESPNet(
        s=args.s, num_classes=num_classes,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    variables = init_model(model, train_ds.shape_hw)
    cfg = ClsTrainConfig(epochs=args.epochs, lr=args.lr,
                         optimizer=args.optimizer, scheduler=args.scheduler,
                         weight_decay=args.weight_decay, seed=args.seed)
    res = train_classification(
        model, variables,
        DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed),
        DataLoader(val_ds, args.batch_size) if val_ds else None, cfg)
    state = jax.device_get(res["state"])
    _save_model(
        args.ckpt_dir,
        {"params": state.params, "batch_stats": state.batch_stats},
        {"dataset": "classification", "model": "eespnet_cls", "s": args.s,
         "num_classes": num_classes, "bf16": args.bf16,
         "input_hw": list(train_ds.shape_hw),
         "best_acc": res["best_acc"]},
    )
    print_info_message(f"pretrain done; best val acc {res['best_acc']:.4f}")
    return res


def cmd_eval(args) -> Dict:
    from mspl_tpu.data.datasets import build_dataset
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.engine.train import evaluate, make_eval_step

    model, variables, meta = load_model_checkpoint(args.checkpoint)
    ds = build_dataset(args.dataset or meta["dataset"], args.data_root,
                       args.val_list,
                       size_wh=tuple(args.size) if args.size else None)
    loader = DataLoader(ds, args.batch_size)
    eval_step = make_eval_step(model, meta["num_classes"])

    save_dir = getattr(args, "save_viz", None)
    if save_dir:
        # reference test_segmentation.py-style colorized prediction dumps
        # (SURVEY.md §3.4 "optional colorized PNG overlay saved").  One pass
        # over the set: the jitted step returns both the prediction map and
        # the batch confusion matrix, so eval isn't traversed twice.
        import jax
        import jax.numpy as jnp

        from mspl_tpu.data.label_io import save_colorized_png
        from mspl_tpu.data.transforms import normalize
        from mspl_tpu.engine.metrics import MIOU, confusion_matrix

        os.makedirs(save_dir, exist_ok=True)
        nc = meta["num_classes"]

        @jax.jit
        def predict(params, batch_stats, batch):
            x = normalize(batch["image"])  # same pipeline as make_eval_step
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=False)
            pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
            cm = confusion_matrix(pred, batch["label"], nc,
                                  batch_mask=batch.get("valid"))
            return pred, cm

        miou_acc = MIOU(nc)
        for batch in loader:
            preds, cm = predict(variables["params"],
                                variables["batch_stats"], batch)
            miou_acc.update(cm)
            preds = np.asarray(preds)
            for j, idx in enumerate(np.asarray(batch["index"])):
                if not bool(batch["valid"][j]):
                    continue
                save_colorized_png(
                    preds[j],
                    os.path.join(save_dir, f"pred_{int(idx):06d}.png"),
                    _viz_palette(nc, args.dataset or meta.get("dataset")))
        iou, miou = miou_acc.get_iou()
    else:
        iou, miou = evaluate(eval_step, variables["params"],
                             variables["batch_stats"], loader,
                             meta["num_classes"])
    info = dataset_info(args.dataset or meta["dataset"])
    names = info.class_names or [str(i) for i in range(meta["num_classes"])]
    for n, v in zip(names, iou):
        print(f"  {n:>16s}: IoU {v:.4f}")
    print_info_message(f"mIoU: {miou:.4f}")
    return {"iou": iou, "miou": miou}


def _viz_palette(num_classes: int, dataset: Optional[str]) -> np.ndarray:
    """Colorization palette: the canonical greenhouse colors, else a
    deterministic evenly-spaced HSV wheel sized to the label space (the
    reference only ships a palette for its target domain)."""
    import colorsys

    from mspl_tpu.data.label_io import GREENHOUSE_PALETTE

    if dataset == "greenhouse" and num_classes <= GREENHOUSE_PALETTE.shape[0]:
        return GREENHOUSE_PALETTE
    cols = [colorsys.hsv_to_rgb(i / max(num_classes, 1), 0.75, 0.95)
            for i in range(num_classes)]
    return (np.asarray(cols) * 255).astype(np.uint8)


def cmd_infer(args) -> Dict:
    """Predict-only inference over an (optionally unlabeled) image list:
    raw prediction PNGs + colorized overlays (+ uint8 confidence maps) —
    the reference's test_segmentation.py flow without requiring ground
    truth (SURVEY.md §3.4; `eval` covers the labeled variant + mIoU)."""
    import jax
    import jax.numpy as jnp

    from mspl_tpu.data.datasets import build_dataset
    from mspl_tpu.data.label_io import save_colorized_png, save_label_png
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.data.transforms import normalize

    model, variables, meta = load_model_checkpoint(args.checkpoint)
    use_depth = bool(getattr(args, "rgbd", False))
    ds = build_dataset(args.dataset or meta["dataset"], args.data_root,
                       args.list,
                       size_wh=tuple(args.size) if args.size else None,
                       use_depth=use_depth)
    ck_ch = int(meta.get("in_channels", 3))
    if ck_ch != ds.channels:
        raise SystemExit(
            f"checkpoint stem takes {ck_ch} channels but the image list "
            f"provides {ds.channels} (--rgbd mismatch)")
    loader = DataLoader(ds, args.batch_size)
    os.makedirs(args.out_dir, exist_ok=True)
    nc = int(meta["num_classes"])
    palette = _viz_palette(nc, args.dataset or meta.get("dataset"))

    @jax.jit
    def predict(imgs):
        x = normalize(imgs)
        logits = model.apply(variables, x, train=False)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(p, axis=-1).astype(jnp.uint8), jnp.max(p, axis=-1)

    n = 0
    for batch in loader:
        pred, conf = predict(batch["image"])
        pred, conf = np.asarray(pred), np.asarray(conf)
        for j, idx in enumerate(np.asarray(batch["index"])):
            if not bool(batch["valid"][j]):
                continue
            stem = f"{int(idx):06d}"
            save_label_png(pred[j],
                           os.path.join(args.out_dir, f"pred_{stem}.png"))
            save_colorized_png(pred[j],
                               os.path.join(args.out_dir, f"viz_{stem}.png"),
                               palette)
            if args.save_conf:
                save_label_png(
                    np.clip(conf[j] * 255.0, 0, 255).astype(np.uint8),
                    os.path.join(args.out_dir, f"conf_{stem}.png"))
            n += 1
    print_info_message(f"wrote {n} predictions -> {args.out_dir}")
    return {"n": n, "out_dir": args.out_dir}


def _load_sources(ckpts, num_target: int):
    import jax

    from mspl_tpu.pseudo.generate import make_source

    # channel-major logits feed the fused Pallas pass (soft AND hard modes,
    # TPU) — strictly faster there, pointless on the CPU/interpret path
    channel_major = jax.default_backend() != "cpu"
    sources = []
    for c in ckpts:
        model, variables, meta = load_model_checkpoint(c)
        sources.append(
            make_source(meta["dataset"], model, variables, meta["dataset"],
                        num_target=num_target, channel_major=channel_major,
                        in_channels=int(meta.get("in_channels", 3)))
        )
    return sources


def _production_mesh(batch_size: int, model_parallel: int = 1):
    """(model, data) mesh for the generation/self-training entry points
    (SURVEY.md §2 parallelism table; BASELINE.json:5 "pmap DP over a TPU
    slice").  Returns None on a single device with no model parallelism —
    the unsharded path avoids shard_map overhead on one chip."""
    import jax

    if jax.device_count() == 1 and model_parallel <= 1:
        return None
    if model_parallel > jax.device_count():
        raise SystemExit(
            f"--model-parallel {model_parallel} exceeds the visible device "
            f"count ({jax.device_count()}); the model axis cannot be wider "
            "than the mesh")
    from mspl_tpu.parallel.mesh import make_mesh_for_batch

    return make_mesh_for_batch(batch_size, model=model_parallel)


def _check_min_agree(min_agree, fusion: str, max_models: int) -> None:
    """Range-validate --min-agree (ADVICE r3): <=0 silently disables the
    agreement gate inside _hard_epilogue, > n_models ignores every pixel,
    and the flag does nothing under soft fusion."""
    if min_agree is None:
        return
    if fusion != "hard":
        print_warning_message(
            f"--min-agree {min_agree} is ignored under --fusion {fusion}; "
            "it only affects hard fusion")
        return
    if not 1 <= min_agree <= max_models:
        raise SystemExit(
            f"--min-agree {min_agree} out of range: must be in "
            f"[1, {max_models}] (number of models voting)")


def cmd_pseudo(args) -> Dict:
    from mspl_tpu.data.datasets import GreenhouseRGBD
    from mspl_tpu.data.label_io import save_colorized_png, save_label_png, write_train_list
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.cbst import sweep_kc
    from mspl_tpu.pseudo.generate import generate_pseudo_labels
    from mspl_tpu.utils.registry import IGNORE_LABEL

    info = dataset_info("greenhouse")
    t = info.num_classes
    _check_min_agree(args.min_agree, args.fusion, len(args.checkpoints))
    sources = _load_sources(args.checkpoints, t)
    ds = GreenhouseRGBD(args.data_root, args.target_list,
                        size_wh=tuple(args.size) if args.size else None,
                        use_depth=getattr(args, "rgbd", False))
    loader = DataLoader(ds, args.batch_size)
    conf_mode = args.conf_mode
    threshold = args.threshold
    if getattr(args, "entropy_threshold", None) is not None:
        # --entropy-threshold TAU drops pixels whose normalized entropy
        # H/ln(T+1) exceeds TAU, i.e. keeps conf = 1 - H/ln(T+1) >= 1 - TAU
        conf_mode = "entropy"
        threshold = 1.0 - args.entropy_threshold
    mesh = _production_mesh(args.batch_size,
                            getattr(args, "model_parallel", 1))
    if mesh is not None:
        print_info_message(f"generation mesh: {dict(mesh.shape)}")
    # device-resident result set unless per-pixel confidences must be dumped
    # (--save-conf): kc sweep + re-threshold run on device and only the final
    # uint8 labels are fetched (BASELINE.json:5 "labels stay on-device")
    on_device = not args.save_conf
    labels, confs, indices = generate_pseudo_labels(
        sources, loader, mode=args.fusion, use_pallas=args.pallas,
        conf_mode=conf_mode, min_agree=args.min_agree, mesh=mesh,
        return_device=on_device)

    if args.p is not None:  # class-balanced thresholds
        kc = sweep_kc(labels, confs, t, args.p)
    else:
        kc = np.full(t, threshold, np.float32)
    if on_device:
        from mspl_tpu.pseudo.cbst import apply_kc_device

        labels = np.asarray(apply_kc_device(labels, confs, kc)).astype(np.int32)
    else:
        safe = np.where(labels == IGNORE_LABEL, 0, labels)
        labels = np.where(confs >= kc[safe], labels,
                          IGNORE_LABEL).astype(np.int32)

    os.makedirs(args.out_dir, exist_ok=True)
    img_paths, lab_paths = [], []
    for j, idx in enumerate(indices):
        lp = os.path.join(args.out_dir, f"pseudo_{int(idx):06d}.png")
        save_label_png(labels[j], lp)
        if args.save_viz:
            save_colorized_png(
                labels[j], os.path.join(args.out_dir,
                                        f"viz_{int(idx):06d}.png"))
        if args.save_conf:
            # per-pixel fused max-prob confidence (reference writes these
            # alongside the label PNGs, BASELINE.json:8)
            np.save(os.path.join(args.out_dir, f"conf_{int(idx):06d}.npy"),
                    confs[j].astype(np.float16))
        img_paths.append(ds.pairs[int(idx)][0])
        lab_paths.append(lp)
    write_train_list(os.path.join(args.out_dir, "train_list.txt"),
                     img_paths, lab_paths)
    kept = float((labels != IGNORE_LABEL).mean())
    print_info_message(
        f"pseudo-labels for {len(indices)} images -> {args.out_dir} "
        f"(kept {kept:.2%}, kc={np.round(kc, 3).tolist()})")
    return {"kc": kc, "kept": kept, "n": len(indices)}


def cmd_selftrain(args) -> Dict:
    import jax.numpy as jnp

    from mspl_tpu.data.datasets import GreenhouseRGBD
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.models import build_segmentation_model, init_model
    from mspl_tpu.pseudo.self_training import SelfTrainConfig, self_training

    info = dataset_info("greenhouse")
    t = info.num_classes
    sources = _load_sources(args.checkpoints, t)
    size_wh = tuple(args.size) if args.size else None
    use_depth = getattr(args, "rgbd", False)
    target_ds = GreenhouseRGBD(args.data_root, args.target_list,
                               size_wh=size_wh, use_depth=use_depth)
    val_loader = None
    if args.val_list:
        val_ds = GreenhouseRGBD(args.data_root, args.val_list,
                                size_wh=size_wh, use_depth=use_depth)
        val_loader = DataLoader(val_ds, args.batch_size)

    in_ch = target_ds.channels
    if args.init_checkpoint:
        model, variables, imeta = load_model_checkpoint(args.init_checkpoint)
        ck_ch = int(imeta.get("in_channels", 3))
        if ck_ch != in_ch:
            raise SystemExit(
                f"--init-checkpoint stem takes {ck_ch} channels but the "
                f"target set provides {in_ch} (--rgbd mismatch)")
    else:
        model = build_segmentation_model(
            args.model, num_classes=t, s=args.s,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            **_cm_decoder_kw(args))
        variables = init_model(model, target_ds.shape_hw, channels=in_ch)

    # the ensemble grows by the fine-tuned target model after round 0
    _check_min_agree(args.min_agree, args.fusion, len(args.checkpoints) + 1)
    crop_wh = args.crop_size or size_wh or info.size_wh
    cfg = SelfTrainConfig(
        rounds=args.rounds, p_init=args.p_init, p_step=args.p_step,
        fusion=args.fusion, conf_mode=args.conf_mode,
        min_agree=args.min_agree,
        batch_size=args.batch_size,
        epochs_per_round=args.epochs, crop_hw=(crop_wh[1], crop_wh[0]),
        lr=args.lr, optimizer=args.optimizer, scheduler=args.scheduler,
        weight_decay=args.weight_decay, reg_mode=args.reg_mode,
        reg_weight=args.reg_weight, seed=args.seed, out_dir=args.out_dir,
        ckpt_dir=args.ckpt_dir, use_pallas=args.pallas,
    )
    mesh = _production_mesh(args.batch_size,
                            getattr(args, "model_parallel", 1))
    if mesh is not None:
        print_info_message(f"self-training mesh: {dict(mesh.shape)}")
    res = self_training(model, variables, sources, target_ds, val_loader, t,
                        cfg, mesh=mesh)
    _save_model(
        args.ckpt_dir or "./runs/selftrain", res["variables"],
        {"dataset": "greenhouse", "model": args.model, "s": args.s,
         "num_classes": t, "bf16": args.bf16,
         "input_hw": list(target_ds.shape_hw), "in_channels": in_ch,
         "best_miou": res["best_miou"]},
    )
    print_info_message(f"self-training done; best mIoU {res['best_miou']:.4f}")
    return res


def cmd_import_torch(args) -> Dict:
    """Convert a reference-style torch .pth checkpoint into a native
    checkpoint dir (SURVEY.md §2 "Pretrained weights" — the artifacts
    cannot be fetched here, but a migrating user's .pth files load)."""
    from mspl_tpu.utils.torch_import import import_torch_checkpoint

    meta = {
        "model": args.model,
        "num_classes": args.num_classes,
        "s": args.s,
        "dataset": args.dataset,
        "bf16": bool(args.bf16),
        "input_hw": [args.size[1], args.size[0]] if args.size else None,
        "in_channels": 3,
        "imported_from": os.path.abspath(args.pth),
    }
    # single deserialization: the tensor count for the log line comes back
    # from import_torch_checkpoint (ADVICE r4: the .pth was loaded twice)
    model, variables, n_keys = import_torch_checkpoint(args.pth, meta)
    _save_model(args.out_dir, variables, meta)
    print_info_message(
        f"imported {n_keys} torch tensors -> {args.out_dir} "
        f"({args.model}, {args.num_classes} classes, s={args.s})")
    return {"out_dir": args.out_dir, "n_torch_tensors": n_keys}


def cmd_export_torch(args) -> Dict:
    """Export a native checkpoint as a torch state dict (.pth) runnable by
    the documented-architecture torch twin (mspl_tpu/oracle/)."""
    import torch

    from mspl_tpu.utils.torch_import import export_torch_state_dict

    model, variables, meta = load_model_checkpoint(args.checkpoint)
    sd = export_torch_state_dict(
        meta["model"], variables, num_classes=int(meta["num_classes"]),
        s=float(meta.get("s", 2.0)), **_arch_meta_kw(meta))
    torch.save(sd, args.out)
    print_info_message(f"exported {len(sd)} tensors -> {args.out}")
    return {"out": args.out, "n_tensors": len(sd)}


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="mspl_tpu",
        description="TPU-native multi-source pseudo-label segmentation")
    sub = ap.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a segmentation model")
    t.add_argument("--dataset", required=True, choices=SEGMENTATION_DATASETS)
    t.add_argument("--data-root", required=True)
    t.add_argument("--train-list", required=True)
    t.add_argument("--val-list", default=None)
    t.add_argument("--class-weighting", action="store_true")
    t.add_argument("--pretrained-encoder", default=None,
                   help="classification checkpoint (from `pretrain`) whose "
                        "encoder initializes the segmentation backbone")
    _add_common_train_flags(t)

    pt = sub.add_parser(
        "pretrain", help="classification-pretrain the ESPNetv2 encoder")
    pt.add_argument("--data-root", required=True)
    pt.add_argument("--train-list", required=True,
                    help='list file: "image_path class_id" per line')
    pt.add_argument("--val-list", default=None)
    _add_common_train_flags(pt)
    t.set_defaults(fn=cmd_train)
    pt.set_defaults(fn=cmd_pretrain, epochs=90, lr=0.5, scheduler="hybrid")

    e = sub.add_parser("eval", help="evaluate a checkpoint (per-class IoU)")
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--dataset", default=None, choices=SEGMENTATION_DATASETS)
    e.add_argument("--data-root", required=True)
    e.add_argument("--val-list", required=True)
    e.add_argument("--batch-size", type=int, default=8)
    e.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("W", "H"))
    e.add_argument("--save-viz", default=None, metavar="DIR",
                   help="also write colorized prediction PNGs to DIR")
    e.set_defaults(fn=cmd_eval)

    i = sub.add_parser(
        "infer", help="predict-only inference (no ground truth needed)")
    i.add_argument("--checkpoint", required=True)
    i.add_argument("--dataset", default=None, choices=SEGMENTATION_DATASETS,
                   help="overrides the checkpoint meta (palette/classes)")
    i.add_argument("--data-root", required=True)
    i.add_argument("--list", required=True,
                   help="image list (labels optional, ignored)")
    i.add_argument("--out-dir", required=True)
    i.add_argument("--batch-size", type=int, default=8)
    i.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("W", "H"))
    i.add_argument("--save-conf", action="store_true",
                   help="also write uint8 max-softmax confidence maps")
    i.add_argument("--rgbd", action="store_true",
                   help="'rgb depth' list lines; 4-channel checkpoints")
    i.set_defaults(fn=cmd_infer)

    g = sub.add_parser("pseudo", help="generate pseudo-labels")
    g.add_argument("--checkpoints", nargs="+", required=True,
                   help="source model checkpoints (1=single-source)")
    g.add_argument("--data-root", required=True)
    g.add_argument("--target-list", required=True)
    g.add_argument("--out-dir", required=True)
    g.add_argument("--fusion", default="soft", choices=FUSION_MODES)
    g.add_argument("--min-agree", type=int, default=None,
                   help="hard fusion: minimum models that must agree on a "
                        "pixel (default strict majority; SURVEY.md App. A)")
    g.add_argument("--model-parallel", type=int, default=1,
                   help="place sources across a 'model' mesh axis of this "
                        "size (data parallelism uses the remaining devices)")
    g.add_argument("--rgbd", action="store_true",
                   help="greenhouse RGB-D target list ('rgb depth' lines); "
                        "3-channel sources see the RGB slice")
    g.add_argument("--conf-mode", default="prob", choices=CONF_MODES,
                   help="confidence family for thresholding: max-probability "
                        "or normalized anti-entropy (BASELINE.json:5 "
                        "'confidence/entropy thresholding')")
    g.add_argument("--entropy-threshold", type=float, default=None,
                   metavar="TAU",
                   help="drop pixels whose normalized fused entropy exceeds "
                        "TAU (implies --conf-mode entropy; overrides "
                        "--threshold)")
    g.add_argument("--threshold", type=float, default=0.5)
    g.add_argument("--p", type=float, default=None,
                   help="class-balanced portion (overrides --threshold)")
    g.add_argument("--batch-size", type=int, default=8)
    g.add_argument("--save-viz", action="store_true")
    g.add_argument("--save-conf", action="store_true",
                   help="also write per-image fused confidence maps (.npy)")
    g.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("W", "H"))
    g.add_argument("--pallas", action="store_true")
    g.set_defaults(fn=cmd_pseudo)

    s = sub.add_parser("selftrain", help="multi-round MSPL self-training")
    s.add_argument("--checkpoints", nargs="+", required=True)
    s.add_argument("--data-root", required=True)
    s.add_argument("--target-list", required=True)
    s.add_argument("--val-list", default=None)
    s.add_argument("--init-checkpoint", default=None)
    s.add_argument("--rounds", type=int, default=3)
    s.add_argument("--p-init", type=float, default=0.2)
    s.add_argument("--p-step", type=float, default=0.05)
    s.add_argument("--fusion", default="soft", choices=FUSION_MODES)
    s.add_argument("--conf-mode", default="prob", choices=CONF_MODES)
    s.add_argument("--min-agree", type=int, default=None,
                   help="hard fusion: minimum models that must agree on a "
                        "pixel (default strict majority)")
    s.add_argument("--model-parallel", type=int, default=1,
                   help="place ensemble members across a 'model' mesh axis "
                        "of this size during generation")
    s.add_argument("--reg-mode", default="kld", choices=("none", "kld", "ent"))
    s.add_argument("--reg-weight", type=float, default=0.1)
    s.add_argument("--out-dir", default=None)
    s.add_argument("--pallas", action="store_true")
    _add_common_train_flags(s)
    s.set_defaults(fn=cmd_selftrain, epochs=5, lr=1e-3, scheduler="poly")

    b = sub.add_parser("bench", help="run the headline benchmark")
    # the hardened parent/child orchestration (watchdog, live-check
    # promotion, anchor refresh) — not the bare measurement child; the
    # return code must survive to the shell (a wedged run exits nonzero)
    b.set_defaults(fn=lambda a: sys.exit(__import__("bench").orchestrate([])))

    it = sub.add_parser(
        "import-torch",
        help="convert a torch .pth checkpoint to a native checkpoint dir")
    it.add_argument("--pth", required=True, help="torch state dict / "
                    "checkpoint file (.pth/.pt/.pth.tar; 'module.' "
                    "prefixes and checkpoint envelopes handled)")
    it.add_argument("--model", required=True, choices=MODEL_NAMES)
    it.add_argument("--num-classes", type=int, required=True)
    it.add_argument("--s", type=float, default=2.0)
    it.add_argument("--dataset", default=None,
                    choices=SEGMENTATION_DATASETS,
                    help="recorded in the meta (drives label-space "
                         "conversion when used as a pseudo source)")
    it.add_argument("--size", type=int, nargs=2, default=None,
                    metavar=("W", "H"))
    it.add_argument("--bf16", action="store_true",
                    help="mark the model for bf16 compute at load time")
    it.add_argument("--out-dir", required=True)
    it.set_defaults(fn=cmd_import_torch)

    et = sub.add_parser(
        "export-torch",
        help="export a native checkpoint as a torch .pth state dict")
    et.add_argument("--checkpoint", required=True,
                    help="native checkpoint dir or .msgpack file")
    et.add_argument("--out", required=True, help="output .pth path")
    et.set_defaults(fn=cmd_export_torch)
    return ap


def main(argv=None):
    from mspl_tpu.parallel.mesh import maybe_init_distributed

    if maybe_init_distributed():
        print_info_message("joined multi-host job (jax.distributed)")
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
