"""Tests for warps, soft-argmin family, and disp2prob."""

import numpy as np

from densematchingbenchmark_tpu.ops import (
    inverse_warp_2d, inverse_warp_3d, soft_argmin, local_soft_argmin,
    laplace_prob, gaussian_prob, onehot_prob, upsample_2d, upsample_3d,
    adaptive_avg_pool2d, adaptive_max_pool2d)


def test_inverse_warp_2d_integer_shift():
    img = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
    disp = np.full((1, 1, 8, 1), 2.0, np.float32)
    out = np.asarray(inverse_warp_2d(img, disp))
    # out[x] = img[x + 2]; last two columns out of frame -> 0
    np.testing.assert_allclose(out[0, 0, :, 0],
                               [2, 3, 4, 5, 6, 7, 0, 0], atol=1e-6)


def test_inverse_warp_2d_fractional():
    img = np.array([[0., 10., 20., 30.]], np.float32).reshape(1, 1, 4, 1)
    disp = np.full((1, 1, 4, 1), 0.5, np.float32)
    out = np.asarray(inverse_warp_2d(img, disp))
    np.testing.assert_allclose(out[0, 0, :3, 0], [5., 15., 25.], atol=1e-5)


def test_inverse_warp_3d_validity_mask():
    fm = np.ones((1, 1, 4, 1), np.float32)
    ds = np.array([0., 2.], np.float32)[None, :, None, None]
    ds = np.broadcast_to(ds, (1, 2, 1, 4)).astype(np.float32)
    warped, valid = inverse_warp_3d(fm, ds)
    np.testing.assert_allclose(np.asarray(valid)[0, 0, 0, :, 0], [1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(valid)[0, 1, 0, :, 0], [0, 0, 1, 1])


def test_soft_argmin_peaked_cost():
    d, h, w = 16, 2, 3
    cost = np.zeros((1, d, h, w), np.float32)
    cost[0, 5] = 50.0  # sharp peak at disparity 5
    disp = np.asarray(soft_argmin(cost, max_disp=d))
    np.testing.assert_allclose(disp, np.full((1, h, w, 1), 5.0), atol=1e-3)


def test_soft_argmin_start_disp_dilation():
    cost = np.zeros((1, 3, 1, 1), np.float32)
    cost[0, 1] = 50.0
    # samples: linspace(-2, 3, 3) = [-2, 0.5, 3]
    disp = np.asarray(soft_argmin(cost, max_disp=6, start_disp=-2, dilation=2))
    np.testing.assert_allclose(disp[0, 0, 0, 0], 0.5, atol=1e-3)


def test_soft_argmin_per_pixel_samples():
    cost = np.zeros((1, 2, 1, 1), np.float32)
    cost[0, 1] = 50.0
    samples = np.array([3., 7.], np.float32)[None, :, None, None]
    disp = np.asarray(soft_argmin(cost, disp_sample=samples))
    np.testing.assert_allclose(disp[0, 0, 0, 0], 7.0, atol=1e-3)


def test_local_soft_argmin_matches_window_softmax():
    d = 8
    cost = np.random.RandomState(0).rand(1, d, 2, 2).astype(np.float32)
    cost[0, 4] += 5.0
    got = np.asarray(local_soft_argmin(cost, max_disp=d, radius=2))
    idx = np.arange(2, 7)
    sub = cost[0, 2:7] * 1.0
    p = np.exp(sub - sub.max(0)) / np.exp(sub - sub.max(0)).sum(0)
    want = (p * idx[:, None, None]).sum(0)
    np.testing.assert_allclose(got[0, :, :, 0], want, atol=1e-4)


def test_laplace_prob_normalized_and_masked():
    gt = np.full((1, 2, 2, 1), 7.3, np.float32)
    gt[0, 1, 1, 0] = 0.0  # invalid (== start_disp)
    prob = np.asarray(laplace_prob(gt, max_disp=16))
    assert prob.shape == (1, 16, 2, 2)
    np.testing.assert_allclose(prob[:, :, 0, 0].sum(), 1.0, atol=1e-4)
    assert prob[0, :, 1, 1].sum() < 1e-30  # masked row ~ eps
    assert prob[0, 7, 0, 0] == prob.max()


def test_gaussian_and_onehot_prob():
    gt = np.full((1, 1, 1, 1), 4.0, np.float32)
    g = np.asarray(gaussian_prob(gt, max_disp=8))
    assert g[0, 4, 0, 0] == g.max()
    oh = np.asarray(onehot_prob(gt, max_disp=8, variance=1))
    np.testing.assert_allclose(oh[0, :, 0, 0],
                               [0, 0, 0, 0, 1, 0, 0, 0], atol=1e-6)


def test_upsample_align_corners():
    x = np.array([0., 3.], np.float32).reshape(1, 1, 2, 1)
    up = np.asarray(upsample_2d(x, 1, 4))
    np.testing.assert_allclose(up[0, 0, :, 0], [0., 1., 2., 3.], atol=1e-5)
    v = np.zeros((1, 2, 1, 2), np.float32)  # [B, D, H, W]
    v[:, 1, :, :] = 6.0
    up3 = np.asarray(upsample_3d(v, 4, 1, 2))
    np.testing.assert_allclose(up3[0, :, 0, 0], [0., 2., 4., 6.], atol=1e-5)


def test_adaptive_pools():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    avg = np.asarray(adaptive_avg_pool2d(x, 2, 2))
    np.testing.assert_allclose(avg[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])
    mx = np.asarray(adaptive_max_pool2d(x, 2, 2))
    np.testing.assert_allclose(mx[0, :, :, 0], [[5, 7], [13, 15]])
