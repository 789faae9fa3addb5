"""Fused EESP branch-stack Pallas kernel vs the lax depthwise-conv reference
(SURVEY.md §7 stage 7 gate)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mspl_tpu.ops.pallas_eesp import eesp_branches_pallas


def _lax_reference(x, weights, dilations):
    """K dilated depthwise convs + HFF + concat via lax (the EESP jnp path)."""
    outs = []
    acc = None
    n = x.shape[-1]
    for k, d in enumerate(dilations):
        w = weights[k].reshape(3, 3, 1, n)  # HWIO depthwise
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(d, d), (d, d)],
            rhs_dilation=(d, d), feature_group_count=n,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        acc = y if acc is None else acc + y
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("dilations", [(1, 2, 3, 4), (1, 1, 2, 3), (1,), (2, 2)])
def test_fused_eesp_matches_lax(dilations):
    rng = np.random.default_rng(0)
    b, h, w, n = 2, 11, 13, 8
    x = jnp.asarray(rng.normal(size=(b, h, w, n)).astype(np.float32))
    weights = jnp.asarray(
        rng.normal(size=(len(dilations), 3, 3, n)).astype(np.float32))
    ref = _lax_reference(x, weights, dilations)
    out = eesp_branches_pallas(x, weights, dilations, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_eesp_tile_multiple_heights():
    rng = np.random.default_rng(1)
    for h in (8, 16, 7, 17):
        x = jnp.asarray(rng.normal(size=(1, h, 10, 8)).astype(np.float32))
        weights = jnp.asarray(rng.normal(size=(2, 3, 3, 8)).astype(np.float32))
        ref = _lax_reference(x, weights, (1, 2))
        out = eesp_branches_pallas(x, weights, (1, 2), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_model_pallas_flag_parity():
    """Same params, use_pallas on/off -> identical segmentation outputs."""
    import jax
    from mspl_tpu.models import ESPNetv2Segmentation, init_model

    m_ref = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8,
                                 use_pallas=False)
    m_pal = ESPNetv2Segmentation(num_classes=3, s=0.5, dec_base_planes=8,
                                 use_pallas=True)
    variables = init_model(m_ref, (32, 48))
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 32, 48, 3)),
                    jnp.float32)
    out_ref = m_ref.apply(variables, x, train=False)
    out_pal = m_pal.apply(variables, x, train=False)
    # atol 5e-5: the dense block-diagonal grouped-conv form (ops/grouped_conv)
    # accumulates in a different order than the per-branch lax path
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-4, atol=5e-5)
