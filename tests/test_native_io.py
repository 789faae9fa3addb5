"""Native C++ IO runtime tests: PNG codec round trips vs PIL, parallel batch
decode, graceful fallback."""

import os

import numpy as np
import pytest

from mspl_tpu.data import native_io


requires_native = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable")


@requires_native
def test_encode_decode_roundtrip_gray(tmp_path):
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 256, size=(23, 31)).astype(np.uint8)
    p = str(tmp_path / "lab.png")
    native_io.encode_png(p, lab)
    # decode with PIL (cross-codec check)
    from PIL import Image

    with Image.open(p) as im:
        assert im.mode == "L"
        np.testing.assert_array_equal(np.asarray(im), lab)
    # decode with native (identity size)
    out = native_io.decode_png(p, (23, 31), channels=1, bilinear=False)
    np.testing.assert_array_equal(out, lab)


@requires_native
def test_encode_decode_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 19, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    native_io.encode_png(p, img)
    out = native_io.decode_png(p, (17, 19), channels=3)
    np.testing.assert_array_equal(out, img)


@requires_native
def test_decode_pil_written_pngs(tmp_path):
    """Native decoder must read PIL-written files (all filter types live)."""
    from PIL import Image

    rng = np.random.default_rng(2)
    # smooth gradient images trigger PIL's filtered scanlines
    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.stack([np.tile(x, (48, 1))] * 3, -1)
    img += rng.integers(0, 3, img.shape).astype(np.uint8)
    p = str(tmp_path / "grad.png")
    Image.fromarray(img).save(p)
    out = native_io.decode_png(p, (48, 64), channels=3)
    np.testing.assert_array_equal(out, img)

    # palette-mode PNG
    pal = Image.fromarray(rng.integers(0, 4, (20, 20)).astype(np.uint8),
                          mode="P")
    pal.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255] + [0] * 756)
    pp = str(tmp_path / "pal.png")
    pal.save(pp)
    out = native_io.decode_png(pp, (20, 20), channels=3)
    ref = np.asarray(Image.open(pp).convert("RGB"))
    np.testing.assert_array_equal(out, ref)

    # RGBA -> RGB drop alpha
    rgba = rng.integers(0, 256, size=(12, 14, 4)).astype(np.uint8)
    pa = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, mode="RGBA").save(pa)
    out = native_io.decode_png(pa, (12, 14), channels=3)
    np.testing.assert_array_equal(out, rgba[..., :3])


@requires_native
def test_batch_decode_parallel(tmp_path):
    rng = np.random.default_rng(3)
    paths, imgs = [], []
    for i in range(12):
        img = rng.integers(0, 256, size=(16, 20, 3)).astype(np.uint8)
        p = str(tmp_path / f"b{i}.png")
        native_io.encode_png(p, img)
        paths.append(p)
        imgs.append(img)
    out = native_io.decode_png_batch(paths, (16, 20), channels=3,
                                     num_threads=4)
    assert out.shape == (12, 16, 20, 3)
    np.testing.assert_array_equal(out, np.stack(imgs))


@requires_native
def test_native_resize_nearest_labels(tmp_path):
    lab = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "l.png")
    native_io.encode_png(p, lab)
    out = native_io.decode_png(p, (16, 16), channels=1, bilinear=False)
    # 2x nearest: each source pixel replicated
    np.testing.assert_array_equal(out[::2, ::2], lab)


def test_missing_file_falls_back_or_raises(tmp_path):
    with pytest.raises(Exception):
        native_io.decode_png(str(tmp_path / "missing.png"), (4, 4))


@requires_native
def test_palette_label_decode_keeps_indices(tmp_path):
    """Label PNGs in palette mode must decode to raw class indices."""
    from PIL import Image

    rng = np.random.default_rng(4)
    idx = rng.integers(0, 11, (15, 18)).astype(np.uint8)
    pal = Image.fromarray(idx, mode="P")
    pal.putpalette(list(rng.integers(0, 255, 768)))
    p = str(tmp_path / "pal_label.png")
    pal.save(p)
    out = native_io.decode_png(p, (15, 18), channels=1, bilinear=False)
    np.testing.assert_array_equal(out, idx)


@requires_native
def test_dataset_load_batch_matches_per_item(tmp_path):
    """The native batch fast path must match per-item loads exactly."""
    from mspl_tpu.data.datasets import CamVidSegmentation
    from mspl_tpu.data.label_io import save_label_png, write_train_list

    rng = np.random.default_rng(5)
    root = str(tmp_path)
    imgs, labs = [], []
    for i in range(5):
        img = rng.integers(0, 256, (20, 24, 3)).astype(np.uint8)
        lab = rng.integers(0, 11, (20, 24)).astype(np.uint8)
        native_io.encode_png(os.path.join(root, f"i{i}.png"), img)
        save_label_png(lab, os.path.join(root, f"l{i}.png"))
        imgs.append(f"i{i}.png")
        labs.append(f"l{i}.png")
    write_train_list(os.path.join(root, "list.txt"), imgs, labs)
    ds = CamVidSegmentation(root, os.path.join(root, "list.txt"),
                            size_wh=(24, 20))
    bi, bl = ds.load_batch([0, 2, 4])
    for j, idx in enumerate([0, 2, 4]):
        si, sl = ds.load(idx)
        np.testing.assert_array_equal(bi[j], si)
        np.testing.assert_array_equal(bl[j], sl)
