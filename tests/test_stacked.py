"""Ensemble weight stacking (layers/stacking.py + stack= on the model
family): ONE stacked forward must reproduce the per-model forwards.

Every extra multiply in the block-diagonal stacked form is an exact zero and
per-channel ops are order-independent; the only divergence source is fp32
reduction reassociation (the stacked convs tile differently at 3x channels),
so the gate uses the same tolerance class as the torch e2e parity test
(rtol 2e-3 on logits + 99.9% argmax agreement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspl_tpu.layers.stacking import (
    pad_variables_to_template,
    stack_variables,
    stacked_concat,
    stacked_shuffle,
)
from mspl_tpu.models import ESPNetv2Segmentation, init_model

HW = (32, 48)


def _perturb_stats(variables, seed):
    """Randomize BN stats/affines so eval mode is a real affine, not an
    identity (same trick as tests/test_torch_e2e_parity.py)."""
    rng = np.random.default_rng(seed)

    def perturb(path, leaf):
        a = np.asarray(leaf)
        if a.ndim != 1:
            return leaf
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, a.shape), jnp.float32)
        return jnp.asarray(
            a + rng.normal(0.0, 0.05, a.shape).astype(np.float32))

    return jax.tree_util.tree_map_with_path(perturb, variables)


def test_stacked_concat_and_shuffle():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 4, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 4, 4, 9)).astype(np.float32))
    out = stacked_concat([a, b], stack=3)
    # m-major: model m's block is [a_m (2ch) | b_m (3ch)]
    np.testing.assert_array_equal(out[..., 0:2], a[..., 0:2])
    np.testing.assert_array_equal(out[..., 2:5], b[..., 0:3])
    np.testing.assert_array_equal(out[..., 5:7], a[..., 2:4])
    np.testing.assert_array_equal(out[..., 7:10], b[..., 3:6])

    x = jnp.asarray(rng.normal(size=(1, 2, 2, 12)).astype(np.float32))
    sh = stacked_shuffle(x, groups=2, stack=2)
    # per-model shuffle of [g, c] -> [c, g] within each model block
    per = np.asarray(x).reshape(1, 2, 2, 2, 2, 3)
    want = per.transpose(0, 1, 2, 3, 5, 4).reshape(1, 2, 2, 12)
    np.testing.assert_array_equal(np.asarray(sh), want)


@pytest.mark.slow  # ~2 min/case on 1 core: two full s=2.0 forwards
@pytest.mark.parametrize("train", [False, True])
def test_stacked_forward_matches_members_uniform(train):
    """Three same-width members (equal classifier) stacked: slices of the
    stacked logits equal each member's logits."""
    classes, s_w = 6, 0.5
    members = []
    for i in range(3):
        m = ESPNetv2Segmentation(num_classes=classes, s=s_w,
                                 dec_base_planes=8)
        v = _perturb_stats(init_model(m, HW, rng=jax.random.PRNGKey(i)),
                           seed=10 + i)
        members.append((m, v))

    stacked_model = ESPNetv2Segmentation(num_classes=classes, s=s_w,
                                         dec_base_planes=8, stack=3)
    sv = stack_variables([v for _, v in members])

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, *HW, 3)).astype(np.float32))

    if train:
        outs = [m.apply(v, x, train=True, mutable=["batch_stats"])
                for m, v in members]
        so, smut = stacked_model.apply(sv, x, train=True,
                                       mutable=["batch_stats"])
        ref = [o for o, _ in outs]
    else:
        ref = [m.apply(v, x, train=False) for m, v in members]
        so = stacked_model.apply(sv, x, train=False)

    assert so.shape == (2, *HW, 3 * classes)
    for i, r in enumerate(ref):
        block = np.asarray(so[..., i * classes:(i + 1) * classes])
        # fp32 reassociation: the stacked conv reductions tile differently
        # (3x the channels), so bitwise equality is not expected — same
        # tolerance class as the torch e2e parity gate
        np.testing.assert_allclose(block, np.asarray(r),
                                   rtol=2e-3, atol=2e-4)
        agree = (block.argmax(-1) == np.asarray(r).argmax(-1)).mean()
        assert agree > 0.999, f"member {i} argmax agreement {agree}" 

    if train:
        # the stacked batch-stats update must equal each member's update
        import flax

        sflat = flax.traverse_util.flatten_dict(smut["batch_stats"])
        for i, (_, mut) in enumerate(outs):
            mflat = flax.traverse_util.flatten_dict(mut["batch_stats"])
            for k, leaf in mflat.items():
                stk = np.asarray(sflat[k])
                n = leaf.shape[-1]
                if "merge_br" in k:  # scale-major interleave
                    got = stk.reshape(5, 3, n // 5)[:, i, :].ravel()
                else:
                    got = stk[i * n:(i + 1) * n]
                np.testing.assert_allclose(got, np.asarray(leaf),
                                           rtol=1e-3, atol=1e-5,
                                           err_msg=str(k))


@pytest.mark.slow  # ~2.5 min on 1 core (3-member stacked forward)
def test_stacked_forward_heterogeneous_heads():
    """The production ensemble shape: classifier widths 19/5 with
    dec_base_planes=16 give DIFFERENT pyrpool proj widths (9 vs 8, the real
    CamVid/Cityscapes/Forest situation) — members pad to the widest
    template; pad classes carry exactly zero softmax mass and true-class
    logits are unchanged."""
    s_w = 0.5
    widths = (19, 5)
    pad_to = max(widths)
    members = []
    for i, c in enumerate(widths):
        m = ESPNetv2Segmentation(num_classes=c, s=s_w, dec_base_planes=16)
        v = _perturb_stats(init_model(m, HW, rng=jax.random.PRNGKey(i)),
                           seed=20 + i)
        members.append((m, v))

    template_model = ESPNetv2Segmentation(num_classes=pad_to, s=s_w,
                                          dec_base_planes=16)
    template = init_model(template_model, HW)
    padded = [pad_variables_to_template(v, template) for _, v in members]
    sv = stack_variables(padded)
    stacked_model = ESPNetv2Segmentation(num_classes=pad_to, s=s_w,
                                         dec_base_planes=16,
                                         stack=len(widths))

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1, (2, *HW, 3)).astype(np.float32))
    so = stacked_model.apply(sv, x, train=False)

    for i, ((m, v), c) in enumerate(zip(members, widths)):
        r = np.asarray(m.apply(v, x, train=False))
        block = np.asarray(so[..., i * pad_to:(i + 1) * pad_to])
        np.testing.assert_allclose(block[..., :c], r, rtol=2e-3, atol=2e-4)
        if c < pad_to:
            # pad classes: softmax mass exactly zero
            p = jax.nn.softmax(jnp.asarray(block), axis=-1)
            assert float(np.asarray(p[..., c:]).max()) == 0.0
