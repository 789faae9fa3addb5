"""Unsynced (per-group) BatchNorm flag (SURVEY.md §7 "BN under pmap",
VERDICT r1 item 8): groups==1 is bit-identical to flax's synced BN; groups=G
matches applying plain BN to each batch slice independently; the train step
honors ``bn_groups`` on a data-sharded batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mspl_tpu.layers.bn import BatchNorm, bn_stat_groups


class _Net(nn.Module):
    cls: type

    @nn.compact
    def __call__(self, x, train=False):
        return self.cls(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=x.dtype)(x)


def _init_and_apply(cls, x, train, groups=1):
    m = _Net(cls)
    v = m.init(jax.random.PRNGKey(0), x)
    # non-trivial affine + running stats so eval mode is exercised too
    v = jax.tree_util.tree_map(lambda a: a, v)
    k = list(v["params"].keys())[0]
    v = {
        "params": {k: {"scale": jnp.asarray([1.5, 0.5, 2.0, 1.0]),
                       "bias": jnp.asarray([0.1, -0.2, 0.0, 0.3])}},
        "batch_stats": {k: {"mean": jnp.asarray([0.2, -0.1, 0.0, 0.5]),
                            "var": jnp.asarray([1.2, 0.8, 1.0, 2.0])}},
    }
    with bn_stat_groups(groups):
        return m.apply(v, x, train=train, mutable=["batch_stats"])


@pytest.mark.parametrize("train", [False, True])
def test_groups1_bit_identical_to_flax(train):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 5, 6, 4)).astype(np.float32))
    y_ours, mut_ours = _init_and_apply(BatchNorm, x, train, groups=1)
    y_flax, mut_flax = _init_and_apply(nn.BatchNorm, x, train, groups=1)
    np.testing.assert_array_equal(np.asarray(y_ours), np.asarray(y_flax))
    for ours, ref in zip(jax.tree_util.tree_leaves(mut_ours),
                         jax.tree_util.tree_leaves(mut_flax)):
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_grouped_matches_independent_slices():
    """groups=G train-mode output == plain BN applied to each contiguous
    slice of B/G samples with the same params; running stats == mean of the
    per-slice updates."""
    rng = np.random.default_rng(1)
    G = 4
    x = jnp.asarray(rng.normal(size=(8, 5, 6, 4)).astype(np.float32) * 2 + 1)
    y, mut = _init_and_apply(BatchNorm, x, train=True, groups=G)

    slice_outs, slice_means, slice_vars = [], [], []
    for g in range(G):
        xs = x[g * 2:(g + 1) * 2]
        ys, ms = _init_and_apply(nn.BatchNorm, xs, train=True, groups=1)
        slice_outs.append(np.asarray(ys))
        bs = jax.tree_util.tree_leaves(ms["batch_stats"])
        k = list(ms["batch_stats"].keys())[0]
        slice_means.append(np.asarray(ms["batch_stats"][k]["mean"]))
        slice_vars.append(np.asarray(ms["batch_stats"][k]["var"]))

    np.testing.assert_allclose(np.asarray(y), np.concatenate(slice_outs),
                               rtol=1e-5, atol=1e-5)
    k = list(mut["batch_stats"].keys())[0]
    np.testing.assert_allclose(np.asarray(mut["batch_stats"][k]["mean"]),
                               np.mean(slice_means, axis=0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"][k]["var"]),
                               np.mean(slice_vars, axis=0), rtol=1e-6, atol=1e-6)


def test_grouped_differs_from_synced():
    rng = np.random.default_rng(2)
    # deliberately different distributions per half so group stats diverge
    a = rng.normal(size=(4, 5, 6, 4)).astype(np.float32)
    b = rng.normal(size=(4, 5, 6, 4)).astype(np.float32) * 3 + 5
    x = jnp.asarray(np.concatenate([a, b]))
    y_sync, _ = _init_and_apply(BatchNorm, x, train=True, groups=1)
    y_group, _ = _init_and_apply(BatchNorm, x, train=True, groups=2)
    assert not np.allclose(np.asarray(y_sync), np.asarray(y_group), atol=1e-3)


def test_batch_not_divisible_raises():
    x = jnp.zeros((6, 4, 4, 4))
    with pytest.raises(ValueError, match="divisible"):
        _init_and_apply(BatchNorm, x, train=True, groups=4)


@pytest.mark.slow
def test_train_step_bn_groups_on_sharded_batch():
    """End-to-end: make_train_step(bn_groups=4) on a batch sharded over the
    8-device CPU mesh produces batch_stats equal to the mean of per-group
    plain-BN stats — and different from the synced step's stats."""
    from mspl_tpu.engine.schedules import build_schedule
    from mspl_tpu.engine.train import (build_optimizer, create_train_state,
                                       make_train_step)
    from mspl_tpu.models import build_segmentation_model, init_model
    from mspl_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch

    model = build_segmentation_model("espnetv2", num_classes=5, s=0.5)
    hw = (32, 48)
    variables = init_model(model, hw)
    tx = build_optimizer("sgd", build_schedule("fixed", 0.01, 10))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, size=(8, *hw, 3), dtype=np.uint8)
    # skew half the batch bright so group statistics differ measurably
    imgs[4:] = np.clip(imgs[4:].astype(np.int32) + 120, 0, 255).astype(np.uint8)
    labels = rng.integers(0, 5, size=(8, *hw), dtype=np.int32)
    mesh = make_mesh_for_batch(8)
    batch = shard_batch({"image": jnp.asarray(imgs),
                         "label": jnp.asarray(labels)}, mesh)
    key = jax.random.PRNGKey(0)

    stats = {}
    for groups in (1, 4):
        # the jitted step donates its state; hand each run its own copy of
        # the initial variables so the first run's donation can't free them
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        state = replicate(create_train_state(model, fresh, tx), mesh)
        step = make_train_step(model, augment=False, bn_groups=groups)
        new_state, _ = step(state, batch, key)
        stats[groups] = jax.device_get(new_state.batch_stats)

    leaves_sync = jax.tree_util.tree_leaves(stats[1])
    leaves_group = jax.tree_util.tree_leaves(stats[4])
    assert any(not np.allclose(a, b, atol=1e-5)
               for a, b in zip(leaves_sync, leaves_group))
