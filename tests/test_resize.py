"""Resize parity vs torch (SURVEY.md §7 'Resize parity' hard part)."""

import numpy as np
import pytest

from mspl_tpu.ops.resize import adaptive_avg_pool, resize_bilinear, resize_nearest

from tests import torch_oracle as oracle


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((23, 30), (45, 60)), ((45, 60), (23, 30)), ((8, 8), (16, 16)), ((7, 5), (13, 11))],
)
def test_bilinear_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *in_hw, 7)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    ref = oracle.bilinear_resize(x, out_hw, align_corners=align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((45, 60), (23, 30)), ((32, 32), (5, 5))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, *in_hw, 5)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(x, out_hw))
    ref = oracle.adaptive_avg_pool(x, out_hw)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_nearest_label_resize_roundtrip():
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 11, size=(2, 36, 48)).astype(np.int32)
    up = np.asarray(resize_nearest(labels, (72, 96)))
    # exact 2x nearest upsample replicates each pixel
    assert (up[:, ::2, ::2] == labels).all()
    down = np.asarray(resize_nearest(up, (36, 48)))
    assert (down == labels).all()

    # values are always drawn from the input label set
    few = np.asarray(resize_nearest(labels, (17, 23)))
    assert set(np.unique(few)) <= set(np.unique(labels))


def test_resize_identity_shortcut():
    x = np.random.default_rng(3).normal(size=(1, 9, 9, 3)).astype(np.float32)
    assert np.asarray(resize_bilinear(x, (9, 9))) is not None
    np.testing.assert_array_equal(np.asarray(resize_bilinear(x, (9, 9))), x)
