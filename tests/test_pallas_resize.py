"""The Pallas channel-major x2 resize kernel must match the einsum path
(ops/resize.py::resize_bilinear_cm) bit-for-bit at f32."""

import jax
import jax.numpy as jnp
import numpy as np

from mspl_tpu.ops.pallas_resize import resize_x2_cm_pallas
from mspl_tpu.ops.resize import resize_bilinear_cm


def test_resize_x2_cm_kernel_matches_einsum():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 16, 24), jnp.float32)
    want = resize_bilinear_cm(x, (32, 48), align_corners=True)
    got = resize_x2_cm_pallas(x, (32, 48), align_corners=True,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_resize_x2_cm_fallback_shapes():
    """Non-multiple output heights and odd input heights use the einsum
    path and still return the exact einsum result."""
    rng = np.random.RandomState(1)
    for shape, out_hw in (((1, 3, 12, 10), (30, 20)),   # H_in % 8 != 0
                          ((1, 3, 16, 10), (40, 20))):  # H_out % H_in != 0
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        want = resize_bilinear_cm(x, out_hw, align_corners=True)
        got = resize_x2_cm_pallas(x, out_hw, align_corners=True,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
