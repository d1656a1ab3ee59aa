"""Parity: Pallas true-MAC packed stride-1 conv3d == XLA packed conv.

Interpret-mode (CPU) checks of ops/pallas/packed_conv3d_kernel.py against
lax.conv_general_dilated on the unpacked volume (reference semantics:
torch Conv3d k3/s1/p1 as used by aggregators/PSMNet.py:25-53), plus the
custom-VJP backward (which routes through the XLA packed conv).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from densematchingbenchmark_tpu.ops.conv3d import pack_volume, unpack_volume
from densematchingbenchmark_tpu.ops.pallas.packed_conv3d_kernel import (
    conv3d_packed_s1_pallas)


def _dense(x, k):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("pack,ci,co,shape", [
    (4, 5, 7, (1, 8, 8, 6)),      # general channels
    (4, 8, 4, (2, 8, 16, 9)),     # multi-batch, taller H
    (2, 6, 6, (1, 8, 8, 5)),      # pack=2 (single window)
    (4, 16, 8, (1, 16, 8, 7)),    # deeper D
])
def test_pallas_packed_s1_parity(pack, ci, co, shape):
    b, d, h, w = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, d, h, w, ci) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.2, jnp.float32)
    ref = _dense(x, k)
    got = unpack_volume(
        conv3d_packed_s1_pallas(pack_volume(x, pack), k, 1.0, 0.0,
                                pack=pack, h_tile=4, interpret=True), pack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_packed_s1_epilogue():
    """Fused scale/bias/ReLU == conv -> affine -> relu."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 6, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 7) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.rand(7) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(7), jnp.float32)
    ref = jnp.maximum(_dense(x, k) * scale + bias, 0.0)
    got = unpack_volume(
        conv3d_packed_s1_pallas(pack_volume(x, 4), k, scale, bias,
                                pack=4, relu=True, h_tile=4,
                                interpret=True), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_packed_s1_grad():
    """custom_vjp backward (XLA path) == grads of the dense conv."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 6, 5) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 5, 7) * 0.2, jnp.float32)

    def loss_pallas(x_, k_):
        y = conv3d_packed_s1_pallas(pack_volume(x_, 4), k_, 1.0, 0.0,
                                    pack=4, h_tile=4, interpret=True)
        return jnp.sum(y ** 2)

    def loss_dense(x_, k_):
        return jnp.sum(_dense(x_, k_) ** 2)

    gx_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    gx_d, gk_d = jax.grad(loss_dense, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("pack,ci,co,shape", [
    (4, 5, 7, (1, 8, 8, 6)),
    (2, 6, 4, (2, 8, 16, 5)),
])
def test_pallas_packed_s1_v2_parity(pack, ci, co, shape):
    """Rolling-DMA variant == dense conv (interpret mode drives the manual
    DMA ring + semaphores)."""
    from densematchingbenchmark_tpu.ops.pallas.packed_conv3d_kernel import (
        conv3d_packed_s1_pallas_v2)

    b, d, h, w = shape
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, d, h, w, ci) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.rand(co) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(co), jnp.float32)
    ref = jnp.maximum(_dense(x, k) * scale + bias, 0.0)
    got = unpack_volume(
        conv3d_packed_s1_pallas_v2(pack_volume(x, pack), k, scale, bias,
                                   pack=pack, relu=True, h_tile=4,
                                   interpret=True), pack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
