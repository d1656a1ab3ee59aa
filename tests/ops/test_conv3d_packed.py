"""Parity: trunk-packed conv3d schedules == direct XLA conv3d.

Covers ops/conv3d.py pack_volume/unpack_volume, conv3d_packed (D-stride 1
and 2), and conv3d_transpose_packed against lax.conv_general_dilated on the
unpacked volume (reference semantics: torch Conv3d/ConvTranspose3d as used
by dmb/modeling/stereo/cost_processors/aggregators/PSMNet.py:9-95).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax import lax

from densematchingbenchmark_tpu.ops.conv3d import (
    pack_volume, unpack_volume, conv3d_packed, conv3d_transpose_packed)


def _dense(x, k, strides=(1, 1, 1), padding=(1, 1, 1), lhs_dil=(1, 1, 1),
           pads=None):
    return lax.conv_general_dilated(
        x, k, window_strides=strides,
        padding=pads if pads is not None else [(p, p) for p in padding],
        lhs_dilation=lhs_dil,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 5, 6, 3), jnp.float32)
    for pack in (2, 4):
        xp = pack_volume(x, pack)
        assert xp.shape == (2, 8 // pack, 5, 6, pack * 3)
        np.testing.assert_array_equal(np.asarray(unpack_volume(xp, pack)),
                                      np.asarray(x))
        # slot q of row r is depth r*pack + q
        np.testing.assert_array_equal(
            np.asarray(xp[:, 1, ..., 3:6]), np.asarray(x[:, pack + 1]))


@pytest.mark.parametrize("pack", [2, 4])
@pytest.mark.parametrize("hw", [(1, 1, (1, 1)), (2, 2, (1, 1))])
def test_conv3d_packed_parity(pack, hw):
    sh, sw, (ph, pw) = hw
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 9, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 7) * 0.2, jnp.float32)
    for sd in (1, 2):
        ref = _dense(x, k, strides=(sd, sh, sw), padding=(1, ph, pw))
        got = unpack_volume(
            conv3d_packed(pack_volume(x, pack), k, pack,
                          strides=(sd, sh, sw), padding=(1, ph, pw)), pack)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pack", [2, 4])
def test_conv3d_transpose_packed_parity(pack):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 5, 6, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6) * 0.2, jnp.float32)
    # reference: ConvTransposeExact's formulation (k3 s2 p1 op1, unflipped)
    ref = _dense(x, k, lhs_dil=(2, 2, 2), pads=[(1, 2)] * 3)
    got = unpack_volume(
        conv3d_transpose_packed(pack_volume(x, pack), k, pack), pack)
    assert got.shape == ref.shape == (2, 16, 10, 12, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
