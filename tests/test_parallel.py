"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4
"Multi-device tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mspl_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_for_batch,
    replicate,
    shard_batch,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.axis_names == ("model", "data")
    assert m.shape["data"] == 8 and m.shape["model"] == 1

    m2 = make_mesh(model=2)
    assert m2.shape == {"model": 2, "data": 4}

    with pytest.raises(ValueError):
        make_mesh(model=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_mesh(model=2, data=8)  # 16 > 8 devices


def test_make_mesh_for_batch():
    assert make_mesh_for_batch(8).shape["data"] == 8
    assert make_mesh_for_batch(4).shape["data"] == 4
    assert make_mesh_for_batch(3).shape["data"] == 1
    assert make_mesh_for_batch(12).shape["data"] == 4
    assert make_mesh_for_batch(8, model=2).shape == {"model": 2, "data": 4}


def test_shard_batch_and_replicate():
    mesh = make_mesh()
    batch = {"image": np.zeros((8, 4, 4, 3), np.uint8),
             "label": np.zeros((8, 4, 4), np.int32)}
    sharded = shard_batch(batch, mesh)
    # each device holds 1/8 of the batch
    assert sharded["image"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=4)

    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_equivalent_to(NamedSharding(mesh, P()), ndim=2)


def test_gradient_allreduce_semantics():
    """DP grads under GSPMD equal single-device grads on the full batch."""
    mesh = make_mesh()

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

    g_single = jax.grad(loss)(w, x)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    w_rep = jax.device_put(w, NamedSharding(mesh, P()))
    g_dp = jax.jit(jax.grad(loss))(w_rep, x_sharded)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


def test_model_axis_fusion_reduction():
    """Per-model probability tensors sharded over 'model' reduce correctly."""
    mesh = make_mesh(model=2)
    rng = np.random.default_rng(1)
    probs = jnp.asarray(rng.uniform(size=(2, 4, 8, 8, 4)).astype(np.float32))
    expected = np.asarray(probs).mean(axis=0)
    sharded = jax.device_put(probs, NamedSharding(mesh, P("model", "data")))
    fused = jax.jit(lambda p: p.mean(axis=0))(sharded)
    np.testing.assert_allclose(np.asarray(fused), expected, rtol=1e-6)


def test_sharded_pseudo_generation_matches_single_device():
    """generate_pseudo_labels over a 'data'-sharded mesh == unsharded."""
    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.pseudo.generate import SourceModel, generate_pseudo_labels

    conv = label_conversion_matrix("forest")

    def fake_apply(imgs):
        # deterministic 'model': logits from channel statistics
        base = jnp.stack([imgs[..., 0], imgs[..., 1], imgs[..., 2],
                          imgs.mean(-1), -imgs.mean(-1)], axis=-1)
        return base * 3.0

    src = SourceModel("fake", fake_apply, conv)
    ds = SyntheticSegmentation(num_classes=3, size_wh=(16, 16), length=16,
                               seed=9, unlabeled=True)
    lab1, conf1, idx1 = generate_pseudo_labels(
        [src], DataLoader(ds, batch_size=8), mode="soft")
    mesh = make_mesh()
    lab2, conf2, idx2 = generate_pseudo_labels(
        [src], DataLoader(ds, batch_size=8), mode="soft", mesh=mesh)
    np.testing.assert_array_equal(lab1, lab2)
    np.testing.assert_allclose(conf1, conf2, rtol=1e-6)
    np.testing.assert_array_equal(idx1, idx2)


def _hetero_sources(channel_major=False):
    """Three deterministic 'models' with DIFFERENT source label spaces
    (camvid 11 / cityscapes 19 / forest 5 classes) — the real multi-source
    shape heterogeneity the model axis must handle."""
    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.pseudo.generate import SourceModel

    def mk(n_cls, scale, name, src):
        def apply_fn(imgs):
            planes = [imgs[..., c % 3] * ((c % 5) - 2.0) * scale
                      for c in range(n_cls)]
            out = jnp.stack(planes, axis=-1)
            if channel_major:
                out = jnp.transpose(out, (0, 3, 1, 2))
            return out
        return SourceModel(name, apply_fn, label_conversion_matrix(src),
                           channel_major=channel_major)

    return [mk(11, 1.0, "m_camvid", "camvid"),
            mk(19, 0.7, "m_city", "cityscapes"),
            mk(5, 1.3, "m_forest", "forest")]


@pytest.mark.parametrize("mode", ["soft", "hard"])
@pytest.mark.parametrize("model_axis", [2, 3])
def test_model_axis_source_parallel_matches_serial(mode, model_axis):
    """Sources placed ACROSS the 'model' mesh axis (slice i runs
    sources[i::M], fusion = psum over the axis) must reproduce the serial
    all-models-everywhere output exactly (VERDICT r1 item 3)."""
    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.generate import generate_pseudo_labels

    sources = _hetero_sources()
    ds = SyntheticSegmentation(num_classes=3, size_wh=(16, 16), length=8,
                               seed=21, unlabeled=True)
    lab1, conf1, idx1 = generate_pseudo_labels(
        sources, DataLoader(ds, batch_size=4), mode=mode,
        kc=np.asarray([0.3, 0.5, 0.4], np.float32))
    data_axis = 8 // model_axis if 8 % model_axis == 0 else 2
    mesh = make_mesh(model=model_axis, data=data_axis)
    lab2, conf2, idx2 = generate_pseudo_labels(
        sources, DataLoader(ds, batch_size=4), mode=mode,
        kc=np.asarray([0.3, 0.5, 0.4], np.float32), mesh=mesh)
    np.testing.assert_array_equal(lab1, lab2)
    np.testing.assert_allclose(conf1, conf2, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(idx1, idx2)


def test_model_axis_channel_major_sources():
    """Channel-major sources work across the model axis (the in-branch
    transpose replaces the fused cm kernel)."""
    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.generate import generate_pseudo_labels

    serial = _hetero_sources(channel_major=False)
    cm = _hetero_sources(channel_major=True)
    ds = SyntheticSegmentation(num_classes=3, size_wh=(16, 16), length=8,
                               seed=22, unlabeled=True)
    lab1, conf1, _ = generate_pseudo_labels(
        serial, DataLoader(ds, batch_size=4), mode="soft")
    mesh = make_mesh(model=2)
    lab2, conf2, _ = generate_pseudo_labels(
        cm, DataLoader(ds, batch_size=4), mode="soft", mesh=mesh)
    np.testing.assert_array_equal(lab1, lab2)
    np.testing.assert_allclose(conf1, conf2, rtol=1e-6, atol=1e-7)


def test_sharded_cm_pseudo_generation_matches_single_device():
    """Channel-major (fused-kernel-path) generation under a 'data' mesh ==
    unsharded: the shard_map wrapper must hand the Pallas pass local
    shards, not an all-gathered batch."""
    from mspl_tpu.data.datasets import SyntheticSegmentation
    from mspl_tpu.data.label_space import label_conversion_matrix
    from mspl_tpu.data.loader import DataLoader
    from mspl_tpu.pseudo.generate import SourceModel, generate_pseudo_labels

    conv = label_conversion_matrix("forest")

    def fake_apply_cm(imgs):
        base = jnp.stack([imgs[..., 0], imgs[..., 1], imgs[..., 2],
                          imgs.mean(-1), -imgs.mean(-1)], axis=-1)
        return jnp.transpose(base * 3.0, (0, 3, 1, 2))

    src = SourceModel("fake_cm", fake_apply_cm, conv, channel_major=True)
    ds = SyntheticSegmentation(num_classes=3, size_wh=(16, 16), length=16,
                               seed=11, unlabeled=True)
    lab1, conf1, idx1 = generate_pseudo_labels(
        [src], DataLoader(ds, batch_size=8), mode="soft")
    mesh = make_mesh()
    lab2, conf2, idx2 = generate_pseudo_labels(
        [src], DataLoader(ds, batch_size=8), mode="soft", mesh=mesh)
    np.testing.assert_array_equal(lab1, lab2)
    np.testing.assert_allclose(conf1, conf2, rtol=1e-6)
    np.testing.assert_array_equal(idx1, idx2)
