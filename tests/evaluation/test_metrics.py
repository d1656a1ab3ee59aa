"""Tests for on-device evaluation metrics."""

import numpy as np

from densematchingbenchmark_tpu.evaluation import (
    calc_error, calc_error_with_occlusion, occlusion_mask, remove_padding)


def test_calc_error_hand_case():
    gt = np.array([[5., 10., 0., 200.]], np.float32)  # last two invalid
    est = np.array([[5.5, 14., 1., 1.]], np.float32)
    out = calc_error(est, gt, lb=0, ub=192)
    np.testing.assert_allclose(float(out["epe"]), (0.5 + 4.0) / 2, atol=1e-5)
    np.testing.assert_allclose(float(out["1px"]), 50.0, atol=1e-4)
    np.testing.assert_allclose(float(out["3px"]), 50.0, atol=1e-4)
    np.testing.assert_allclose(float(out["5px"]), 0.0, atol=1e-4)


def test_calc_error_empty_mask_is_zero():
    gt = np.zeros((2, 3), np.float32)
    est = np.ones((2, 3), np.float32)
    out = calc_error(est, gt, lb=0, ub=192)
    for v in out.values():
        np.testing.assert_allclose(float(v), 0.0)


def test_occlusion_mask_flags_mismatch():
    # constant disparity 1 everywhere, consistent left/right -> not occluded
    left = np.full((1, 2, 8, 1), 1.0, np.float32)
    right = np.full((1, 2, 8, 1), 1.0, np.float32)
    occ = np.asarray(occlusion_mask(left, right))
    assert occ[0, :, 2:, 0].max() == 0.0  # interior consistent
    assert occ[0, 0, 0, 0] == 1.0  # leftmost column warps out of frame


def test_calc_error_with_occlusion_keys():
    left = np.full((1, 4, 8, 1), 2.0, np.float32)
    right = np.full((1, 4, 8, 1), 2.0, np.float32)
    est = left + 1.0
    out = calc_error_with_occlusion(est, left, right, lb=0, ub=192)
    assert "occ_epe" in out and "noc_epe" in out and "noc_3px" in out
    np.testing.assert_allclose(float(out["noc_epe"]), 1.0, atol=1e-5)


def test_remove_padding():
    x = np.arange(2 * 6 * 5 * 1, dtype=np.float32).reshape(2, 6, 5, 1)
    out = remove_padding(x, 4, 3)
    assert out.shape == (2, 4, 3, 1)
    np.testing.assert_allclose(np.asarray(out), x[:, 2:, :3, :])


def test_heterogeneous_original_sizes_eval():
    """KITTI-style: per-sample original sizes differ; zero-padded GT keeps
    shapes static and the lb=0 mask makes metrics exact."""
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.data import transforms

    rng = np.random.RandomState(0)
    pad_shape = (32, 48)
    sizes = [(28, 44), (30, 40), (32, 48)]
    for h, w in sizes:
        disp = rng.rand(h, w, 1).astype(np.float32) * 20 + 1
        sample = {"leftImage": rng.rand(h, w, 3).astype(np.float32),
                  "rightImage": rng.rand(h, w, 3).astype(np.float32),
                  "leftDisp": disp}
        padded = transforms.pad_to(sample, pad_shape, pad_disp=True)
        assert padded["leftDisp"].shape == pad_shape + (1,)
        est = np.zeros(pad_shape + (1,), np.float32)
        est[-h:, :w] = disp + 1.5  # off by 1.5 inside the frame
        m = calc_error(est[None], padded["leftDisp"][None], lb=0, ub=192)
        np.testing.assert_allclose(float(m["epe"]), 1.5, atol=1e-5)
        np.testing.assert_allclose(float(m["1px"]), 100.0, atol=1e-4)
        np.testing.assert_allclose(float(m["2px"]), 0.0, atol=1e-4)
