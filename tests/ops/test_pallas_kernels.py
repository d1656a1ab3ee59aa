"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from densematchingbenchmark_tpu.ops.pallas import (fused_soft_argmin,
                                                   fused_upsample_soft_argmin)
from densematchingbenchmark_tpu.ops import soft_argmin, upsample_3d


def test_fused_soft_argmin_matches_reference():
    rng = np.random.RandomState(0)
    cost = rng.randn(2, 16, 8, 128).astype(np.float32) * 3
    want = np.asarray(soft_argmin(jnp.asarray(cost), max_disp=16))
    got = np.asarray(fused_soft_argmin(jnp.asarray(cost), max_disp=16,
                                       interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_soft_argmin_start_disp_dilation_alpha():
    rng = np.random.RandomState(1)
    cost = rng.randn(1, 3, 8, 128).astype(np.float32)
    want = np.asarray(soft_argmin(jnp.asarray(cost), max_disp=6,
                                  start_disp=-2, dilation=2, alpha=2.5))
    got = np.asarray(fused_soft_argmin(jnp.asarray(cost), max_disp=6,
                                       start_disp=-2, dilation=2, alpha=2.5,
                                       interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_upsample_soft_argmin_matches_reference():
    rng = np.random.RandomState(2)
    low = rng.randn(1, 12, 8, 64).astype(np.float32)
    out_d, out_h, out_w = 48, 32, 256
    full = upsample_3d(jnp.asarray(low), out_d, out_h, out_w,
                       align_corners=True)
    want = np.asarray(soft_argmin(full, max_disp=out_d))
    got = np.asarray(fused_upsample_soft_argmin(
        jnp.asarray(low), out_d, out_h, out_w, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_fused_upsample_soft_argmin_bf16_input():
    rng = np.random.RandomState(3)
    low = rng.randn(1, 6, 4, 64).astype(np.float32)
    got16 = np.asarray(fused_upsample_soft_argmin(
        jnp.asarray(low, jnp.bfloat16), 12, 8, 128, interpret=True))
    got32 = np.asarray(fused_upsample_soft_argmin(
        jnp.asarray(low), 12, 8, 128, interpret=True))
    np.testing.assert_allclose(got16, got32, atol=0.1)


def test_fused_conv3d_matches_xla():
    from jax import lax
    from densematchingbenchmark_tpu.ops.pallas.conv3d_kernel import (
        fused_conv3d)
    rng = np.random.RandomState(4)
    x = rng.randn(1, 4, 16, 24, 8).astype(np.float32)
    k = rng.randn(3, 3, 3, 8, 16).astype(np.float32) * 0.1
    scale = rng.rand(16).astype(np.float32) + 0.5
    bias = rng.randn(16).astype(np.float32)
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    want_ep = np.maximum(want * scale + bias, 0.0)
    for variant in ("im2col", "taps"):
        got = np.asarray(fused_conv3d(
            jnp.asarray(x), jnp.asarray(k), jnp.asarray(scale),
            jnp.asarray(bias), relu=True, interpret=True, variant=variant))
        np.testing.assert_allclose(got, want_ep, atol=1e-3, rtol=1e-3)
