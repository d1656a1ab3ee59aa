"""Visualization tests: colormaps, save/show tools."""

import numpy as np

from densematchingbenchmark_tpu.visualization import (
    disp_to_color, disp_err_to_color, group_color, SaveResultTool,
    ShowResultTool, conf_to_hist, hist_to_vis)


def test_disp_to_color_shape_range():
    disp = np.random.RandomState(0).rand(16, 20).astype(np.float32) * 100
    rgb = disp_to_color(disp, max_disp=192)
    assert rgb.shape == (16, 20, 3)
    assert rgb.min() >= 0 and rgb.max() <= 255


def test_disp_err_to_color_bins():
    gt = np.full((8, 8), 10.0, np.float32)
    est = gt.copy()
    est[0, 0] = 60.0  # huge error -> dark red bin
    img = disp_err_to_color(est, gt)
    assert img.shape == (8, 8, 3)
    assert not np.allclose(img[0, 0], img[4, 4])
    # invalid GT stays black
    gt2 = gt.copy()
    gt2[1, 1] = 0.0
    img2 = disp_err_to_color(est, gt2)
    np.testing.assert_allclose(img2[1, 1], 0.0)


def test_save_result_tool(tmp_path):
    import os.path as osp
    tool = SaveResultTool(str(tmp_path))
    est = np.random.RandomState(0).rand(1, 16, 20, 1).astype(np.float32) * 50
    gt = est + 1.0
    left = np.random.RandomState(1).rand(1, 16, 20, 3) * 255
    tool("000001", est, gt, left)
    assert osp.exists(tmp_path / "disp_0" / "000001.png")
    assert osp.exists(tmp_path / "color_disp" / "000001.png")
    assert osp.exists(tmp_path / "group_disp" / "000001.png")
    # KITTI submission round trip
    from densematchingbenchmark_tpu.data.io import load_kitti_disp
    back = load_kitti_disp(str(tmp_path / "disp_0" / "000001.png"))
    np.testing.assert_allclose(back, est[0, ..., 0], atol=1 / 256)


def test_show_result_tool():
    rng = np.random.RandomState(0)
    result = {
        "disps": [rng.rand(1, 16, 20, 1).astype(np.float32) * 50
                  for _ in range(2)],
        "confs": [rng.rand(1, 16, 20, 1).astype(np.float32)],
        "leftDisp": rng.rand(1, 16, 20, 1).astype(np.float32) * 50,
        "leftImage": rng.rand(1, 16, 20, 3).astype(np.float32) * 255,
    }
    out = ShowResultTool(max_disp=64)(result)
    assert out["disp_0"].shape == (16, 20, 3)
    assert out["disp_1_err"].shape == (16, 20, 3)
    assert out["group"].shape == (32, 40, 3)
    assert out["conf_0"].shape == (16, 20)
    assert out["conf_0_hist"].shape[1] == 100
    hist = conf_to_hist(result["confs"][0])
    np.testing.assert_allclose(hist.sum(), 1.0, atol=1e-6)
