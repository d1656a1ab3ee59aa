"""Parity: tapped (2-D + D-tap-sum) conv3d vs direct XLA conv3d.

The tapped schedule (ops/conv3d.py) is a pure reassociation of the same
contraction, so it must match lax.conv_general_dilated to float tolerance
for every (kernel, stride, padding, dilation) combination the model zoo
uses (PSM/GC/Acf hourglasses, HWHourglass, AcfNet 8/4/2 deconv).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from densematchingbenchmark_tpu.ops.conv3d import (
    conv3d_tapped, conv3d_transpose_tapped, conv3d_dpack, conv3d_opack)


def _ref_conv3d(x, k, strides, padding, dilation):
    return lax.conv_general_dilated(
        x, k, window_strides=strides, padding=[(p, p) for p in padding],
        rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _ref_deconv3d(x, k, strides, padding, output_padding):
    ks = k.shape[:3]
    pad = [(kk - 1 - p, kk - 1 - p + op)
           for kk, p, op in zip(ks, padding, output_padding)]
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding=pad, lhs_dilation=strides,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


CONV_CASES = [
    # (kernel, stride, padding, dilation) — zoo inventory
    ((3, 3, 3), (1, 1, 1), (1, 1, 1), (1, 1, 1)),   # trunk convs
    ((3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)),   # hourglass down
    ((3, 3, 3), (1, 2, 2), (1, 1, 1), (1, 1, 1)),   # HWHourglass down
    ((3, 3, 3), (1, 1, 1), (2, 2, 2), (2, 2, 2)),   # dilated
    ((1, 1, 1), (1, 1, 1), (0, 0, 0), (1, 1, 1)),   # 1x1x1
    ((5, 3, 3), (1, 1, 1), (2, 1, 1), (1, 1, 1)),   # anisotropic
]

DECONV_CASES = [
    # (kernel, stride, padding, output_padding)
    ((3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)),   # PSM hourglass up
    ((4, 4, 4), (2, 2, 2), (1, 1, 1), (0, 0, 0)),   # GCNet up
    ((3, 3, 3), (1, 2, 2), (1, 1, 1), (0, 1, 1)),   # HWHourglass up
    ((8, 8, 8), (4, 4, 4), (2, 2, 2), (0, 0, 0)),   # AcfNet deconv
]


def test_conv3d_tapped_parity():
    rng = np.random.RandomState(0)
    for ks, ss, ps, ds in CONV_CASES:
        x = jnp.asarray(rng.randn(2, 9, 7, 10, 6), jnp.float32)
        k = jnp.asarray(rng.randn(*ks, 6, 5) * 0.2, jnp.float32)
        got = conv3d_tapped(x, k, ss, ps, ds)
        want = _ref_conv3d(x, k, ss, ps, ds)
        assert got.shape == want.shape, (ks, ss, ps, ds, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                   err_msg=str((ks, ss, ps, ds)))


def test_conv3d_transpose_tapped_parity():
    rng = np.random.RandomState(1)
    for ks, ss, ps, ops in DECONV_CASES:
        x = jnp.asarray(rng.randn(2, 5, 6, 7, 4), jnp.float32)
        k = jnp.asarray(rng.randn(*ks, 4, 3) * 0.2, jnp.float32)
        got = conv3d_transpose_tapped(x, k, ss, ps, ops)
        want = _ref_deconv3d(x, k, ss, ps, ops)
        assert got.shape == want.shape, (ks, ss, ps, ops, got.shape,
                                         want.shape)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                   err_msg=str((ks, ss, ps, ops)))


PACK_CASES = [
    # (D, H, W, Ci, Co, strides, padding, dilation) — sd=1/pd=1/kd=3 only
    (8, 6, 7, 4, 5, (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    (8, 9, 8, 3, 2, (1, 2, 2), (1, 1, 1), (1, 1, 1)),   # H/W stride free
    (16, 6, 7, 4, 1, (1, 1, 1), (1, 2, 2), (1, 2, 2)),  # classify + dilated
]


def test_conv3d_dpack_parity():
    rng = np.random.RandomState(4)
    for pack in (2, 4, 8):
        for d, h, w, ci, co, ss, ps, ds in PACK_CASES:
            if d % pack:
                continue
            x = jnp.asarray(rng.randn(2, d, h, w, ci), jnp.float32)
            k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.2, jnp.float32)
            got = conv3d_dpack(x, k, ss, ps, ds, pack=pack)
            want = _ref_conv3d(x, k, ss, ps, ds)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                       err_msg=f"dpack{pack} {ss} {ps} {ds}")


def test_conv3d_opack_parity():
    rng = np.random.RandomState(5)
    for pack in (2, 4, 8):
        for d, h, w, ci, co, ss, ps, ds in PACK_CASES:
            if d % pack:
                continue
            x = jnp.asarray(rng.randn(2, d, h, w, ci), jnp.float32)
            k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.2, jnp.float32)
            got = conv3d_opack(x, k, ss, ps, ds, pack=pack)
            want = _ref_conv3d(x, k, ss, ps, ds)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                       err_msg=f"opack{pack} {ss} {ps} {ds}")


def test_conv3d_packed_grads():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 5, 5, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 4) * 0.2, jnp.float32)

    def f_ref(x, k):
        return jnp.sum(_ref_conv3d(x, k, (1, 1, 1), (1, 1, 1),
                                   (1, 1, 1)) ** 2)

    gr = jax.grad(f_ref, argnums=(0, 1))(x, k)
    for name, fn in (("dpack", conv3d_dpack), ("opack", conv3d_opack)):
        def f(x, k, fn=fn):
            return jnp.sum(fn(x, k, (1, 1, 1), (1, 1, 1), (1, 1, 1),
                              pack=4) ** 2)
        gp = jax.grad(f, argnums=(0, 1))(x, k)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=name)


def test_conv3d_tapped_grad():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 5, 5, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 4) * 0.2, jnp.float32)

    def f_tap(x, k):
        return jnp.sum(conv3d_tapped(x, k, (2, 1, 1), (1, 1, 1)) ** 2)

    def f_ref(x, k):
        return jnp.sum(_ref_conv3d(x, k, (2, 1, 1), (1, 1, 1),
                                   (1, 1, 1)) ** 2)

    gx1, gk1 = jax.grad(f_tap, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(f_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx1, gx2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gk1, gk2, rtol=1e-4, atol=1e-4)


def test_conv3d_transpose_tapped_grad():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 5, 5, 3), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 3, 2) * 0.2, jnp.float32)

    def f_tap(x, k):
        return jnp.sum(conv3d_transpose_tapped(
            x, k, (2, 2, 2), (1, 1, 1), (1, 1, 1)) ** 2)

    def f_ref(x, k):
        return jnp.sum(_ref_deconv3d(
            x, k, (2, 2, 2), (1, 1, 1), (1, 1, 1)) ** 2)

    gx1, gk1 = jax.grad(f_tap, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(f_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx1, gx2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gk1, gk2, rtol=1e-4, atol=1e-4)
