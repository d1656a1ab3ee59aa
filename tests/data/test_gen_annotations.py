"""Annotation generator tests: synthetic dataset trees -> JSON -> dataset."""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _touch_png(path, shape=(8, 12, 3)):
    os.makedirs(osp.dirname(path), exist_ok=True)
    from imageio.v2 import imwrite
    imwrite(path, np.zeros(shape, np.uint8))


def test_scene_flow_generator(tmp_path):
    root = str(tmp_path / "SceneFlow")
    from densematchingbenchmark_tpu.data.io import save_pfm
    for split in ("TRAIN", "TEST"):
        for side in ("left", "right"):
            _touch_png(osp.join(root, "flyingthings3d",
                                "frames_cleanpass", split, "A", "0000",
                                side, "0006.png"))
            p = osp.join(root, "flyingthings3d", "disparity", split, "A",
                         "0000", side, "0006.pfm")
            os.makedirs(osp.dirname(p), exist_ok=True)
            save_pfm(p, np.ones((8, 12), np.float32))
    out = str(tmp_path / "ann")
    subprocess.run([sys.executable, osp.join(REPO, "tools",
                                             "gen_annotations.py"),
                    "--dataset", "SceneFlow", "--data-root", root,
                    "--out-dir", out], check=True, capture_output=True)
    with open(osp.join(out, "cleanpass_train.json")) as fp:
        metas = json.load(fp)
    assert len(metas) == 1
    # generated annotations load through the dataset
    from densematchingbenchmark_tpu.data import SceneFlowDataset
    ds = SceneFlowDataset(osp.join(out, "cleanpass_train.json"), root)
    s = ds[0]
    assert s["leftImage"].shape == (8, 12, 3)
    assert s["leftDisp"].shape == (8, 12, 1)


def test_kitti_generator(tmp_path):
    root = str(tmp_path / "kitti")
    from densematchingbenchmark_tpu.data.io import save_kitti_disp
    for d in ("image_2", "image_3"):
        _touch_png(osp.join(root, "training", d, "000000_10.png"))
        _touch_png(osp.join(root, "training", d, "000000_11.png"))  # skip
        _touch_png(osp.join(root, "testing", d, "000001_10.png"))
    os.makedirs(osp.join(root, "training", "disp_occ_0"), exist_ok=True)
    save_kitti_disp(osp.join(root, "training", "disp_occ_0",
                             "000000_10.png"),
                    np.ones((8, 12), np.float32))
    out = str(tmp_path / "ann")
    subprocess.run([sys.executable, osp.join(REPO, "tools",
                                             "gen_annotations.py"),
                    "--dataset", "KITTI-2015", "--data-root", root,
                    "--out-dir", out], check=True, capture_output=True)
    with open(osp.join(out, "full_train.json")) as fp:
        train = json.load(fp)
    assert len(train) == 1 and "left_disp_map_path" in train[0]
    with open(osp.join(out, "full_test.json")) as fp:
        test = json.load(fp)
    assert len(test) == 1 and "left_disp_map_path" not in test[0]
