"""Parity: 64-phase lowering of ConvTranspose3d(1,1,8,4,2) == lhs-dilated.

Guards AcfNet's learned 4x cost upsampler (reference
dmb/modeling/stereo/cost_processors/aggregators/AcfNet.py:56-58) whose
direct lowering tile-pads the 1-channel output 256x on TPU.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from densematchingbenchmark_tpu.ops.conv3d import conv3d_transpose_c1_phase


def _ref(x, k):
    # ConvTransposeExact's original formulation: lhs_dilation=4,
    # pad (k-1-p, k-1-p+op) = (5,5), unflipped kernel
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding=[(5, 5)] * 3,
        lhs_dilation=(4, 4, 4),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_c1_phase_deconv_parity():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 5, 7, 1), jnp.float32)
    k = jnp.asarray(rng.randn(8, 8, 8, 1, 1) * 0.1, jnp.float32)
    ref = _ref(x, k)
    got = conv3d_transpose_c1_phase(x, k)
    assert got.shape == (2, 24, 20, 28) and ref.shape[1:4] == got.shape[1:]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[..., 0]),
                               rtol=1e-5, atol=1e-5)


def test_s2_c1_phase_matches_lhs_dilated():
    """8-phase k3/s2/p1/op1 head == the lhs-dilated transposed conv
    (GCNet layer-37 semantics), all edges included."""
    import numpy as np
    import jax.numpy as jnp
    from jax import lax
    from densematchingbenchmark_tpu.ops.conv3d import (
        conv3d_transpose_s2_c1_phase)

    rng = np.random.RandomState(11)
    ci = 6
    x = jnp.asarray(rng.randn(2, 4, 6, 10, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, 1), jnp.float32)
    ref = lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1),
        padding=[(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[..., 0]
    got = conv3d_transpose_s2_c1_phase(x, k)
    assert got.shape == ref.shape == (2, 8, 12, 20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
