"""Tests for the stereo loss library."""

import numpy as np
import jax
import jax.numpy as jnp

from densematchingbenchmark_tpu.losses import (
    smooth_l1_loss, gerf_loss, conf_nll_loss, quantile_loss,
    stereo_focal_loss, make_loss_evaluator)
from densematchingbenchmark_tpu.losses.builder import total_loss


def test_smooth_l1_hand_case():
    gt = np.full((1, 2, 2, 1), 3.0, np.float32)
    est = gt + np.array([0.5, 2.0, -0.5, 0.0],
                        np.float32).reshape(1, 2, 2, 1)
    out = smooth_l1_loss([est], gt, max_disp=16)
    # huber: 0.125, 1.5, 0.125, 0 -> mean 0.4375
    np.testing.assert_allclose(float(out["l1_loss_lvl0"]), 0.4375, atol=1e-6)


def test_smooth_l1_masks_invalid_gt():
    gt = np.zeros((1, 2, 2, 1), np.float32)  # all invalid (KITTI zeros)
    gt[0, 0, 0, 0] = 5.0
    est = np.full((1, 2, 2, 1), 6.0, np.float32)
    out = smooth_l1_loss([est], gt, max_disp=16)
    np.testing.assert_allclose(float(out["l1_loss_lvl0"]), 0.5, atol=1e-6)
    # fully-invalid GT -> exactly 0, no NaN
    out0 = smooth_l1_loss([est], np.zeros_like(gt), max_disp=16)
    np.testing.assert_allclose(float(out0["l1_loss_lvl0"]), 0.0, atol=1e-7)


def test_smooth_l1_multiscale_rescale():
    # GT at 4x4, prediction at 2x2: gt values divide by scale 2, avg-pooled
    gt = np.full((1, 4, 4, 1), 8.0, np.float32)
    est = np.full((1, 2, 2, 1), 4.0, np.float32)  # exactly scaled gt
    out = smooth_l1_loss([est], gt, max_disp=32)
    np.testing.assert_allclose(float(out["l1_loss_lvl0"]), 0.0, atol=1e-6)


def test_weights_and_level_names():
    gt = np.full((1, 2, 2, 1), 3.0, np.float32)
    est = gt + 2.0
    out = smooth_l1_loss([est, est], gt, max_disp=16, weights=(1.0, 0.5))
    assert set(out) == {"l1_loss_lvl0", "l1_loss_lvl1"}
    np.testing.assert_allclose(float(out["l1_loss_lvl1"]),
                               0.5 * float(out["l1_loss_lvl0"]))


def test_gerf_loss_zero_at_perfect():
    gt = np.full((1, 2, 2, 1), 3.0, np.float32)
    out = gerf_loss([gt.copy()], gt, max_disp=16)
    np.testing.assert_allclose(float(out["gerf_loss_lvl0"]), 0.0, atol=1e-6)
    out2 = gerf_loss([gt + 2.0], gt, max_disp=16)
    want = np.sqrt(4.0 + 4.0) / 2 - 1
    np.testing.assert_allclose(float(out2["gerf_loss_lvl0"]), want, atol=1e-5)


def test_conf_nll_loss():
    gt = np.full((1, 2, 2, 1), 3.0, np.float32)
    conf_cost = np.zeros((1, 2, 2, 1), np.float32)  # sigmoid=0.5
    out = conf_nll_loss([conf_cost], gt, max_disp=16)
    np.testing.assert_allclose(float(out["conf_loss_lvl0"]),
                               np.log(2.0), atol=1e-5)


def test_quantile_loss_direction():
    gt = np.full((1, 4, 4, 1), 10.0, np.float32)
    good = quantile_loss(gt - 2.0, gt + 2.0, gt, max_disp=192)
    bad = quantile_loss(gt + 2.0, gt - 2.0, gt, max_disp=192)
    assert float(good) < float(bad)
    # min too high penalized 0.95 per unit, max too low 0.95 per unit
    np.testing.assert_allclose(float(bad), 2 * 0.95 * 2.0, atol=1e-5)
    np.testing.assert_allclose(float(good), 2 * 0.05 * 2.0, atol=1e-5)


def test_stereo_focal_loss_prefers_correct_peak():
    d = 12
    gt = np.full((1, 4, 4, 1), 5.0, np.float32)
    good = np.zeros((1, d, 4, 4), np.float32)
    good[0, 5] = 10.0
    bad = np.roll(good, 3, axis=1)
    lg = stereo_focal_loss([good], gt, max_disp=d, variance=1.0,
                           focal_coefficient=5.0)
    lb = stereo_focal_loss([bad], gt, max_disp=d, variance=1.0,
                           focal_coefficient=5.0)
    assert float(lg["stereo_focal_loss_lvl0"]) < \
        float(lb["stereo_focal_loss_lvl0"])


def test_stereo_focal_loss_variance_map_and_grad():
    d = 8
    gt = np.full((2, 4, 4, 1), 3.0, np.float32)
    var = np.full((2, 4, 4, 1), 1.2, np.float32)
    cost = np.random.RandomState(0).rand(2, d, 4, 4).astype(np.float32)

    def f(c):
        out = stereo_focal_loss([c], gt, max_disp=d, variance=jnp.asarray(var))
        return out["stereo_focal_loss_lvl0"]

    val, grad = jax.value_and_grad(f)(jnp.asarray(cost))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_combined_evaluator():
    gt = np.full((1, 4, 4, 1), 5.0, np.float32)
    est = gt + 1.0
    cost = np.zeros((1, 8, 4, 4), np.float32)
    ev = make_loss_evaluator({
        "l1_loss": dict(max_disp=8, weights=(1.0, 0.7), weight=2.0),
        "focal_loss": dict(max_disp=8, weight=1.0, coefficient=5.0,
                           variance=1.0),
    })
    out = ev([est, est], [cost], gt)
    assert set(out) == {"l1_loss_lvl0", "l1_loss_lvl1",
                        "stereo_focal_loss_lvl0"}
    # weight=2 applied on top of per-level weights
    np.testing.assert_allclose(float(out["l1_loss_lvl0"]), 2.0 * 0.5,
                               atol=1e-5)
    assert np.isfinite(float(total_loss(out)))
