"""CLI integration test: the reference's public workflow end-to-end in
miniature — train two source models (different label spaces) -> eval ->
multi-source pseudo-label generation -> self-training rounds — all through
the argparse surface (SURVEY.md §3 entry points / BASELINE.json configs)."""

import os

import numpy as np
import pytest

from mspl_tpu.cli import main
from mspl_tpu.data.label_io import save_label_png, write_train_list
from mspl_tpu.utils.registry import dataset_info


def _make_png_dataset(root, name, num_classes, n=6, size_wh=(32, 24)):
    """Synthetic file-backed dataset in reference list format."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(hash(name) % 2**31)
    imgs, labs = [], []
    w, h = size_wh
    for i in range(n):
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        lab = rng.integers(0, num_classes, size=(h, w)).astype(np.uint8)
        ip, lp = f"img_{i}.png", f"lab_{i}.png"
        Image.fromarray(img).save(os.path.join(root, ip))
        save_label_png(lab, os.path.join(root, lp))
        imgs.append(ip)
        labs.append(lp)
    write_train_list(os.path.join(root, "list.txt"), imgs, labs)
    # unlabeled list (images only)
    with open(os.path.join(root, "unlabeled.txt"), "w") as f:
        for ip in imgs:
            f.write(ip + "\n")
    return root


@pytest.mark.slow
def test_cli_full_workflow(tmp_path):
    size = ["--size", "32", "24"]
    small = ["--s", "0.5", "--batch-size", "4", "--epochs", "2",
             "--optimizer", "adam", "--lr", "0.005", "--scheduler", "fixed"]

    ckpts = []
    for ds_name in ("camvid", "forest"):
        root = _make_png_dataset(
            str(tmp_path / ds_name), ds_name,
            dataset_info(ds_name).num_classes)
        ckpt = str(tmp_path / f"ckpt_{ds_name}")
        main(["train", "--dataset", ds_name, "--data-root", root,
              "--train-list", os.path.join(root, "list.txt"),
              "--val-list", os.path.join(root, "list.txt"),
              "--ckpt-dir", ckpt, "--class-weighting"] + size + small)
        assert os.path.exists(os.path.join(ckpt, "model_best.msgpack"))
        ckpts.append(ckpt)

        viz_dir = str(tmp_path / f"eval_viz_{ds_name}")
        res = main(["eval", "--checkpoint", ckpt, "--data-root", root,
                    "--val-list", os.path.join(root, "list.txt"),
                    "--batch-size", "4", "--save-viz", viz_dir] + size)
        assert 0.0 <= res["miou"] <= 1.0
        assert len([f for f in os.listdir(viz_dir)
                    if f.startswith("pred_")]) == 6

    # greenhouse target (unlabeled) + labeled val
    gh_root = _make_png_dataset(str(tmp_path / "greenhouse"), "greenhouse", 3)

    out_dir = str(tmp_path / "pseudo_out")
    res = main(["pseudo", "--checkpoints"] + ckpts + [
        "--data-root", gh_root,
        "--target-list", os.path.join(gh_root, "unlabeled.txt"),
        "--out-dir", out_dir, "--fusion", "soft", "--p", "0.7",
        "--batch-size", "4", "--save-viz"] + size)
    assert res["n"] == 6
    assert os.path.exists(os.path.join(out_dir, "train_list.txt"))
    assert len([f for f in os.listdir(out_dir) if f.startswith("pseudo_")]) == 6
    assert len([f for f in os.listdir(out_dir) if f.startswith("viz_")]) == 6

    # single-source generation (config #2) with plain threshold
    res1 = main(["pseudo", "--checkpoints", ckpts[0],
                 "--data-root", gh_root,
                 "--target-list", os.path.join(gh_root, "unlabeled.txt"),
                 "--out-dir", str(tmp_path / "pseudo_single"),
                 "--threshold", "0.3", "--batch-size", "4"] + size)
    assert res1["n"] == 6

    # self-training: 1 round through the CLI
    st_ckpt = str(tmp_path / "selftrain_ckpt")
    res2 = main(["selftrain", "--checkpoints"] + ckpts + [
        "--data-root", gh_root,
        "--target-list", os.path.join(gh_root, "unlabeled.txt"),
        "--val-list", os.path.join(gh_root, "list.txt"),
        "--rounds", "1", "--p-init", "0.6",
        "--ckpt-dir", st_ckpt,
        "--out-dir", str(tmp_path / "st_labels")] + size + small)
    assert len(res2["history"]) == 1
    assert os.path.exists(os.path.join(st_ckpt, "model_best.msgpack"))


@pytest.mark.slow
def test_cli_pretrain_and_encoder_transfer(tmp_path):
    """`pretrain` trains an EESPNet classifier from a list file and `train
    --pretrained-encoder` initializes the segmentation backbone from it."""
    from PIL import Image

    root = tmp_path / "cls"
    root.mkdir()
    rng = np.random.default_rng(0)
    pal = rng.integers(30, 220, size=(3, 3))
    lines = []
    for i in range(12):
        c = i % 3
        img = np.clip(np.full((24, 24, 3), pal[c], float)
                      + rng.normal(0, 10, (24, 24, 3)), 0, 255).astype(np.uint8)
        Image.fromarray(img).save(root / f"c_{i}.png")
        lines.append(f"c_{i}.png {c}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")

    ckpt = str(tmp_path / "ckpt_cls")
    main(["pretrain", "--data-root", str(root), "--train-list", "train.txt",
          "--size", "24", "24", "--s", "0.5", "--batch-size", "4",
          "--epochs", "1", "--optimizer", "adam", "--lr", "0.003",
          "--scheduler", "fixed", "--ckpt-dir", ckpt])
    assert os.path.exists(os.path.join(ckpt, "model_best.msgpack"))

    seg_root = _make_png_dataset(str(tmp_path / "camvid"), "camvid",
                                 dataset_info("camvid").num_classes, n=4)
    res = main(["train", "--dataset", "camvid", "--data-root", seg_root,
                "--train-list", os.path.join(seg_root, "list.txt"),
                "--ckpt-dir", str(tmp_path / "ckpt_seg"),
                "--pretrained-encoder", ckpt,
                "--size", "32", "24", "--s", "0.5", "--batch-size", "4",
                "--epochs", "1", "--optimizer", "adam", "--lr", "0.005",
                "--scheduler", "fixed"])
    assert np.isfinite(res["history"][-1]["loss"])


@pytest.mark.slow
def test_cli_infer_unlabeled(tmp_path):
    """`infer`: predict-only flow on an image-only list — pred/viz(/conf)
    PNGs out, no ground truth required (reference test_segmentation.py
    without labels, SURVEY.md §3.4)."""
    import jax

    from mspl_tpu.cli import _save_model
    from mspl_tpu.models import build_segmentation_model, init_model
    from PIL import Image

    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(5):
        img = rng.integers(0, 255, size=(24, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(root / f"i_{i}.png")
        lines.append(f"i_{i}.png")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")

    info = dataset_info("camvid")
    model = build_segmentation_model("espnetv2", num_classes=info.num_classes,
                                     s=0.5)
    variables = init_model(model, (24, 32), rng=jax.random.PRNGKey(3))
    ckpt = str(tmp_path / "ckpt")
    _save_model(ckpt, variables,
                {"dataset": "camvid", "model": "espnetv2", "s": 0.5,
                 "num_classes": info.num_classes, "bf16": False,
                 "input_hw": [24, 32], "in_channels": 3})

    out = str(tmp_path / "preds")
    res = main(["infer", "--checkpoint", ckpt, "--data-root", str(root),
                "--list", str(lst), "--out-dir", out, "--batch-size", "4",
                "--size", "32", "24", "--save-conf"])
    assert res["n"] == 5
    names = sorted(os.listdir(out))
    assert len([f for f in names if f.startswith("pred_")]) == 5
    assert len([f for f in names if f.startswith("viz_")]) == 5
    assert len([f for f in names if f.startswith("conf_")]) == 5
    from PIL import Image as I

    with I.open(os.path.join(out, "pred_000000.png")) as im:
        arr = np.asarray(im)
    assert arr.shape == (24, 32) and arr.max() < info.num_classes


def test_viz_palette_and_arch_meta_kw():
    """Pure helpers: per-dataset palettes are full-coverage and
    deterministic; architecture meta keys round-trip with list->tuple
    normalization and unknown models/keys are ignored."""
    from mspl_tpu.cli import _arch_meta_kw, _viz_palette
    from mspl_tpu.data.label_io import GREENHOUSE_PALETTE

    p11 = _viz_palette(11, "camvid")
    assert p11.shape == (11, 3) and p11.dtype == np.uint8
    assert len({tuple(c) for c in p11}) == 11  # distinct colors per class
    np.testing.assert_array_equal(p11, _viz_palette(11, "camvid"))
    np.testing.assert_array_equal(_viz_palette(3, "greenhouse"),
                                  GREENHOUSE_PALETTE)

    kw = _arch_meta_kw({"model": "deeplabv3", "stage_blocks": [2, 2, 2, 2],
                        "aspp_features": 64, "num_classes": 5})
    assert kw == {"stage_blocks": (2, 2, 2, 2), "aspp_features": 64}
    assert _arch_meta_kw({"model": "espnetv2", "stage_blocks": [1]}) == {}
    assert _arch_meta_kw({"model": "espnetv2", "dec_base_planes": 8}) == \
        {"dec_base_planes": 8}
    assert _arch_meta_kw({"model": "unknown"}) == {}
