"""Data layer tests (SURVEY.md §7 stage 4 gate)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.data.datasets import (
    CamVidSegmentation,
    CityscapesSegmentation,
    GreenhouseRGBD,
    SyntheticSegmentation,
    build_dataset,
)
from mspl_tpu.data.label_io import (
    colorize_label,
    load_label_png,
    save_label_png,
    write_train_list,
)
from mspl_tpu.data.label_space import (
    convert_label_map,
    label_conversion_lut,
    label_conversion_matrix,
)
from mspl_tpu.data.loader import DataLoader
from mspl_tpu.data.transforms import (
    eval_transform,
    normalize,
    random_scale_crop_flip,
    train_transform,
)
from mspl_tpu.utils.registry import IGNORE_LABEL, dataset_info


def test_lut_matrix_mass_preservation():
    # property (SURVEY.md §4): LUT conversion preserves probability mass
    for src in ("camvid", "cityscapes", "forest", "greenhouse"):
        m = label_conversion_matrix(src)
        assert m.shape[0] == dataset_info(src).num_classes
        np.testing.assert_allclose(m.sum(axis=1), 1.0)
        lut = label_conversion_lut(src)
        # matrix agrees with LUT
        for s, t in enumerate(lut):
            col = m.shape[1] - 1 if t == IGNORE_LABEL else t
            assert m[s, col] == 1.0


def test_convert_label_map():
    lab = np.array([[0, 5], [10, 255]], np.uint8)  # camvid: sky, tree, bicyclist
    out = convert_label_map(lab, "camvid")
    assert out[0, 0] == IGNORE_LABEL  # sky -> ignore
    assert out[0, 1] == 0  # tree -> plant
    assert out[1, 0] == IGNORE_LABEL  # bicyclist -> ignore
    assert out[1, 1] == IGNORE_LABEL  # ignore passes through


def test_normalize_range():
    img = np.full((2, 4, 4, 3), 255, np.uint8)
    out = np.asarray(normalize(jnp.asarray(img)))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_random_scale_crop_flip_shapes_and_labels():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(40, 56, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 5, size=(40, 56)).astype(np.int32))
    out_i, out_l = jax.jit(
        lambda i, l, k: random_scale_crop_flip(i, l, (24, 32), k)
    )(img, lab, jax.random.PRNGKey(0))
    assert out_i.shape == (24, 32, 3)
    assert out_l.shape == (24, 32)
    vals = set(np.unique(np.asarray(out_l)))
    assert vals <= set(range(5)) | {IGNORE_LABEL}


def test_random_scale_crop_identity_window():
    # scale=1 crop window == full image at origin reproduces the input
    img = jnp.asarray(np.random.default_rng(1).uniform(size=(16, 16, 3)),
                      jnp.float32)
    lab = jnp.asarray(np.arange(256).reshape(16, 16) % 7, jnp.int32)
    out_i, out_l = random_scale_crop_flip(
        img, lab, (16, 16), jax.random.PRNGKey(3), scale_range=(1.0, 1.0)
    )
    flipped = bool(np.allclose(np.asarray(out_i), np.asarray(img)[:, ::-1]))
    if flipped:
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(img)[:, ::-1],
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lab)[:, ::-1])
    else:
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(img), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lab))


def test_train_transform_batched():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, size=(4, 32, 48, 3)).astype(np.uint8)
    labs = rng.integers(0, 3, size=(4, 32, 48)).astype(np.int32)
    out_i, out_l = jax.jit(
        lambda i, l, k: train_transform(i, l, (24, 24), k)
    )(jnp.asarray(imgs), jnp.asarray(labs), jax.random.PRNGKey(1))
    assert out_i.shape == (4, 24, 24, 3)
    assert out_l.shape == (4, 24, 24)
    # different per-image randomness
    assert not np.allclose(np.asarray(out_i[0]), np.asarray(out_i[1]))


def test_eval_transform():
    imgs = np.zeros((2, 30, 40, 3), np.uint8)
    out = eval_transform(jnp.asarray(imgs), (36, 48))
    assert out.shape == (2, 36, 48, 3)


def test_synthetic_dataset_learnable_structure():
    ds = SyntheticSegmentation(num_classes=4, size_wh=(32, 24), length=8)
    img, lab = ds.load(0)
    assert img.shape == (24, 32, 3) and lab.shape == (24, 32)
    img2, lab2 = ds.load(0)
    np.testing.assert_array_equal(img, img2)  # deterministic
    assert set(np.unique(lab)) <= set(range(4))


def test_file_datasets_and_label_io(tmp_path):
    from PIL import Image

    root = str(tmp_path)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(20, 30, 3)).astype(np.uint8)
    lab = rng.integers(0, 11, size=(20, 30)).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(root, "img0.png"))
    save_label_png(lab, os.path.join(root, "lab0.png"))
    write_train_list(os.path.join(root, "train.txt"), ["img0.png"], ["lab0.png"])

    ds = CamVidSegmentation(root, os.path.join(root, "train.txt"), size_wh=(30, 20))
    assert len(ds) == 1
    im, lb = ds.load(0)
    np.testing.assert_array_equal(im, img)
    np.testing.assert_array_equal(lb, lab)

    # unlabeled greenhouse list (image only)
    with open(os.path.join(root, "unlab.txt"), "w") as f:
        f.write("img0.png\n")
    gh = GreenhouseRGBD(root, os.path.join(root, "unlab.txt"), size_wh=(30, 20))
    _, lb = gh.load(0)
    assert (lb == IGNORE_LABEL).all()

    # cityscapes raw-id conversion
    raw = np.zeros((20, 30), np.uint8)
    raw[:5] = 7   # road -> train id 0
    raw[5:] = 23  # sky -> train id 10
    save_label_png(raw, os.path.join(root, "city.png"))
    write_train_list(os.path.join(root, "city.txt"), ["img0.png"], ["city.png"])
    cs = CityscapesSegmentation(root, os.path.join(root, "city.txt"),
                                size_wh=(30, 20), raw_ids=True)
    _, lb = cs.load(0)
    assert (lb[:5] == 0).all() and (lb[5:] == 10).all()

    # round-trip label PNG + colorize
    assert (load_label_png(os.path.join(root, "lab0.png")) == lab).all()
    viz = colorize_label(lab)
    assert viz.shape == (20, 30, 3)

    with pytest.raises(ValueError):
        build_dataset("nope", root, os.path.join(root, "train.txt"))


def test_decoded_uint8_cache(tmp_path, monkeypatch):
    """enable_cache(): each image is decoded at most once across repeated
    sweeps (VERDICT r2 item 3 — the reference re-reads PNGs every epoch);
    the byte budget is respected; cached results are identical to decoded."""
    from PIL import Image

    root = str(tmp_path)
    rng = np.random.default_rng(5)
    names, labs = [], []
    for i in range(4):
        img = rng.integers(0, 255, size=(8, 10, 3)).astype(np.uint8)
        lab = rng.integers(0, 11, size=(8, 10)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"i{i}.png"))
        save_label_png(lab, os.path.join(root, f"l{i}.png"))
        names.append(f"i{i}.png")
        labs.append(f"l{i}.png")
    write_train_list(os.path.join(root, "t.txt"), names, labs)

    ds = CamVidSegmentation(root, os.path.join(root, "t.txt"),
                            size_wh=(10, 8))
    want = [ds.load(i) for i in range(4)]

    calls = {"n": 0}
    orig = type(ds)._load_impl

    def counting(self, i):
        calls["n"] += 1
        return orig(self, i)

    monkeypatch.setattr(type(ds), "_load_impl", counting)
    monkeypatch.setattr(
        type(ds), "_load_batch_impl",
        lambda self, idx: tuple(
            np.stack(z) for z in zip(*[counting(self, int(i)) for i in idx])))

    ds.enable_cache(1 << 20)
    for sweep in range(3):  # load() and load_batch() share the cache
        for i in range(4):
            im, lb = ds.load(i)
            np.testing.assert_array_equal(im, want[i][0])
            np.testing.assert_array_equal(lb, want[i][1])
        bi, bl = ds.load_batch(np.arange(4))
        np.testing.assert_array_equal(bi[2], want[2][0])
    assert calls["n"] == 4  # one decode per image, ever

    # a budget too small for anything: every access decodes
    ds2 = CamVidSegmentation(root, os.path.join(root, "t.txt"),
                             size_wh=(10, 8))
    monkeypatch.setattr(type(ds2), "_load_impl", counting)
    ds2.enable_cache(8)  # bytes — below one sample
    calls["n"] = 0
    ds2.load(0), ds2.load(0)
    assert calls["n"] == 2
    assert ds2._cache_used == 0


def test_loader_batching_padding_and_shuffle():
    ds = SyntheticSegmentation(num_classes=3, size_wh=(16, 12), length=10)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 12, 16, 3)
    assert batches[0]["label"].dtype == np.int32
    # tail batch padded with valid mask
    assert batches[-1]["valid"].sum() == 2
    assert batches[0]["valid"].all()
    # shuffling changes across epochs
    order1 = np.concatenate([b["index"] for b in batches])
    order2 = np.concatenate([b["index"] for b in list(dl)])
    assert not np.array_equal(order1, order2)
    # drop_last
    dl2 = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(list(dl2)) == 2


@pytest.mark.slow
def test_greenhouse_rgbd_depth_ingestion(tmp_path):
    """SURVEY.md §2 'Greenhouse RGB(-D)': use_depth=True parses
    'rgb depth [label]' lists, returns uint8 [H,W,4], batches through the
    loader, and the model trains with in_channels=4."""
    from PIL import Image

    root = str(tmp_path)
    rng = np.random.default_rng(5)
    n = 4
    for i in range(n):
        img = rng.integers(0, 255, size=(20, 30, 3)).astype(np.uint8)
        dep = rng.integers(0, 255, size=(20, 30)).astype(np.uint8)
        lab = rng.integers(0, 3, size=(20, 30)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"rgb{i}.png"))
        Image.fromarray(dep, mode="L").save(os.path.join(root, f"d{i}.png"))
        save_label_png(lab, os.path.join(root, f"l{i}.png"))
    with open(os.path.join(root, "rgbd.txt"), "w") as f:
        for i in range(n):
            f.write(f"rgb{i}.png d{i}.png l{i}.png\n")

    ds = build_dataset("greenhouse", root, os.path.join(root, "rgbd.txt"),
                       size_wh=(30, 20), use_depth=True)
    assert ds.channels == 4
    im, lb = ds.load(0)
    assert im.shape == (20, 30, 4) and im.dtype == np.uint8
    assert lb.shape == (20, 30)
    dep0 = np.asarray(Image.open(os.path.join(root, "d0.png")))
    np.testing.assert_array_equal(im[..., 3], dep0)

    dl = DataLoader(ds, batch_size=2)
    batch = next(iter(dl))
    assert batch["image"].shape == (2, 20, 30, 4)

    # 4-channel normalize: depth channel maps [0,255] -> [-1, 1]
    import jax.numpy as jnp

    from mspl_tpu.data.transforms import normalize

    out = normalize(jnp.asarray(batch["image"]))
    assert out.shape == (2, 20, 30, 4)
    d = np.asarray(out[..., 3])
    np.testing.assert_allclose(
        d, (batch["image"][..., 3] / 255.0 - 0.5) / 0.5, atol=1e-6)

    # the model stem accepts 4 channels and a train step runs
    from mspl_tpu.engine.train import (TrainLoopConfig, train_segmentation)
    from mspl_tpu.models import ESPNetv2Segmentation, init_model

    model = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8)
    variables = init_model(model, (20, 30), channels=4)
    cfg = TrainLoopConfig(epochs=1, crop_hw=(20, 30), scale_range=(0.9, 1.1),
                          lr=0.01, scheduler="fixed", optimizer="adam",
                          verbose=False)
    res = train_segmentation(model, variables, dl, None, num_classes=3,
                             cfg=cfg)
    assert np.isfinite(res["history"][0]["loss"])
