"""Tests for auxiliary ops: confidence measures, sparsification, CSPN,
bilateral filter, SSIM/photometric loss, relative loss, cost norms."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.models.conf_measure import (
    pkr_confidence, apkr_confidence, nlm_confidence, generate_gt_confidence)
from densematchingbenchmark_tpu.evaluation.sparsification import (
    sparsification_plot)
from densematchingbenchmark_tpu.ops.propagation import (
    affinity_propagate_2d, affinity_propagate_3d, bilateral_filter)
from densematchingbenchmark_tpu.losses.self_supervised import (
    ssim, inverse_warp_loss, lr_consistency_mask)
from densematchingbenchmark_tpu.losses.relative_loss import relative_loss
from densematchingbenchmark_tpu.models.cost_norm import (
    CostVolumeNorm, range_norm)


def test_pkr_confidence_sharp_vs_flat():
    sharp = np.zeros((1, 16, 2, 2), np.float32)
    sharp[0, 5] = 10.0
    flat = np.zeros((1, 16, 2, 2), np.float32)
    flat[0, 5] = 10.0
    flat[0, 11] = 9.5  # strong second peak
    c_sharp = np.asarray(pkr_confidence(sharp))
    c_flat = np.asarray(pkr_confidence(flat))
    assert (c_sharp > c_flat).all()
    assert 0 <= c_flat.min() and c_sharp.max() <= 1.0
    assert np.asarray(apkr_confidence(sharp)).shape == (1, 1, 2, 2)
    assert np.isfinite(np.asarray(nlm_confidence(sharp))).all()


def test_generate_gt_confidence():
    est = np.array([[5.0, 8.0, 1.0]], np.float32)
    gt = np.array([[5.3, 2.0, 0.0]], np.float32)
    conf = np.asarray(generate_gt_confidence(est, gt, theta=1.0, lb=0))
    np.testing.assert_allclose(conf, [[1, 0, 0]])


def test_sparsification_plot_confidence_beats_random():
    rng = np.random.RandomState(0)
    gt = rng.rand(64, 64).astype(np.float32) * 50 + 1
    noise = rng.randn(64, 64).astype(np.float32)
    est = gt + noise * 3
    conf = 1.0 / (1.0 + np.abs(noise))  # confidence correlates with error
    out = sparsification_plot(est, gt, conf, bins=10, lb=0, ub=192)
    # removing the least confident half should reduce EPE vs removing none
    assert out["est_50"] < out["est_0"]
    # oracle must be at least as good as the confidence curve
    assert out["oracle_50"] <= out["est_50"] + 1e-6
    # random removal leaves EPE roughly unchanged
    assert abs(out["random_50"] - out["random_0"]) < 0.5


def test_affinity_propagate_identity():
    """Center-only affinity == identity mapping."""
    rng = np.random.RandomState(0)
    feat = rng.rand(1, 4, 4, 2).astype(np.float32)
    aff = np.zeros((1, 4, 4, 9), np.float32)
    aff[..., 4] = 1.0  # center tap
    out = np.asarray(affinity_propagate_2d(aff, feat))
    np.testing.assert_allclose(out, feat, atol=1e-6)
    vol = rng.rand(1, 3, 4, 4, 2).astype(np.float32)
    aff3 = np.zeros((1, 3, 4, 4, 27), np.float32)
    aff3[..., 13] = 1.0
    np.testing.assert_allclose(
        np.asarray(affinity_propagate_3d(aff3, vol)), vol, atol=1e-6)


def test_bilateral_filter_preserves_edges():
    disp = np.zeros((1, 8, 8, 1), np.float32)
    disp[:, :, 4:] = 10.0
    img = np.zeros((1, 8, 8, 3), np.float32)
    img[:, :, 4:] = 255.0  # strong edge aligned with disparity edge
    out = np.asarray(bilateral_filter(disp, img))
    # edge preserved: left stays ~0, right stays ~10
    assert abs(out[0, 4, 2, 0]) < 0.5
    assert abs(out[0, 4, 6, 0] - 10.0) < 0.5


def test_ssim_and_warp_loss():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    assert float(ssim(x, x)) < 1e-5  # identical -> no dissimilarity
    y = rng.rand(1, 16, 16, 3).astype(np.float32)
    assert float(ssim(x, y)) > 0.1

    # perfect disparity -> low photometric loss vs wrong disparity
    TRUE_D = 4
    left = rng.rand(1, 16, 32, 3).astype(np.float32)
    right = np.roll(left, -TRUE_D, axis=2)
    good = np.full((1, 16, 32, 1), float(TRUE_D), np.float32)
    bad = np.full((1, 16, 32, 1), 0.0, np.float32)
    lg = inverse_warp_loss([good], left, right)["warp_loss_lvl0"]
    lb = inverse_warp_loss([bad], left, right)["warp_loss_lvl0"]
    assert float(lg) < float(lb)

    lm, rm = lr_consistency_mask(good, good)
    assert np.asarray(lm)[0, :, TRUE_D + 1:, 0].mean() > 0.9


def test_relative_loss_prefers_correct_order():
    gt = np.full((1, 8, 8, 1), 10.0, np.float32)
    label = np.ones_like(gt)
    better = relative_loss([gt + 0.1], gt, label, max_disp=64)
    worse = relative_loss([gt + 30.0], gt, label, max_disp=64)
    assert np.isfinite(float(better["relative_loss_lvl0"]))
    assert np.isfinite(float(worse["relative_loss_lvl0"]))


def test_cost_volume_norm():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 4, 4).astype(np.float32) * 5
    normed = np.asarray(range_norm(jnp.asarray(x)))
    assert normed.min() >= -1e-5 and normed.max() <= 1 + 1e-5
    m = CostVolumeNorm(kind="std")
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(vars_, jnp.asarray(x))
    assert np.isfinite(np.asarray(out)).all()
    assert "weight" in vars_["params"]
