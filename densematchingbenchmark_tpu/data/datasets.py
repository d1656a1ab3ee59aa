"""Stereo datasets: SceneFlow, KITTI-2012/2015, and a synthetic fixture.

Parity targets:
  dmb/data/datasets/stereo/base.py:8-50 (JSON annotation list + Loader)
  dmb/data/datasets/stereo/scene_flow/base.py:9-54
  dmb/data/datasets/stereo/kitti/base.py:9-53

Annotation format is the reference's: a JSON list of dicts with
'left_image_path' / 'right_image_path' / optional 'left_disp_map_path' /
'right_disp_map_path', relative to a data root — existing annotation files
work unchanged. Samples are channels-last numpy dicts.
"""

import json
import os.path as osp

import numpy as np

from .io import load_image, load_disp


class StereoDataset:
    """JSON-annotated stereo dataset; disparity loader set per subclass."""

    name = "Stereo"

    def __init__(self, ann_file, root, transform=None, use_right_disp=False):
        self.root = root
        self.ann_file = ann_file
        with open(ann_file) as fp:
            self.data_list = json.load(fp)
        self.transform = transform
        self.use_right_disp = use_right_disp

    def __len__(self):
        return len(self.data_list)

    def _load_disp(self, path):
        return load_disp(osp.join(self.root, path))

    def load(self, idx):
        item = self.data_list[idx]
        sample = {
            "leftImage": load_image(osp.join(self.root,
                                             item["left_image_path"])),
            "rightImage": load_image(osp.join(self.root,
                                              item["right_image_path"])),
        }
        sample["original_size"] = sample["leftImage"].shape[:2]
        if item.get("left_disp_map_path"):
            sample["leftDisp"] = self._load_disp(
                item["left_disp_map_path"])[..., None]
        if self.use_right_disp and item.get("right_disp_map_path"):
            sample["rightDisp"] = self._load_disp(
                item["right_disp_map_path"])[..., None]
        return sample

    def __getitem__(self, idx, rng=None):
        sample = self.load(idx)
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample


class SceneFlowDataset(StereoDataset):
    name = "SceneFlow"


class Kitti2012Dataset(StereoDataset):
    name = "KITTI-2012"


class Kitti2015Dataset(StereoDataset):
    name = "KITTI-2015"


class SyntheticStereoDataset:
    """Procedural stereo pairs with exact ground truth, for CI and overfit
    tests (replaces the reference's absolute-path 'visualization_data' debug
    workflow, GETTING_STARTED.md "Tricks for debug").

    Right image = left shifted by a smoothly varying disparity field
    (constant per vertical band), rendered from random textures. The warp is
    right[x] = left... — we construct left FROM right so the GT disparity is
    exact: left[y, x] = right[y, x - d(y, x)].
    """

    name = "Synthetic"

    def __init__(self, length=16, height=128, width=256, max_disp=32,
                 transform=None, seed=0, with_right_disp=False):
        self.length = length
        self.h, self.w, self.max_disp = height, width, max_disp
        self.transform = transform
        self.seed = seed
        self.with_right_disp = with_right_disp

    def __len__(self):
        return self.length

    def load(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.h, self.w
        # smooth random texture (right view)
        right = rng.random((h, w + self.max_disp, 3)).astype(np.float32)
        for _ in range(2):  # cheap blur for matchable gradients
            right = (right + np.roll(right, 1, 1) + np.roll(right, -1, 1) +
                     np.roll(right, 1, 0) + np.roll(right, -1, 0)) / 5.0
        right *= 255.0
        # piecewise-constant integer disparity in [1, max_disp)
        n_bands = 4
        edges = np.sort(rng.integers(1, w - 1, n_bands - 1))
        disp_vals = rng.integers(1, self.max_disp, n_bands)
        disp = np.zeros((h, w), np.float32)
        start = 0
        for e, v in zip(list(edges) + [w], disp_vals):
            disp[:, start:e] = float(v)
            start = e
        xs = np.arange(w)
        src = (xs[None, :] - disp + self.max_disp).astype(np.int64)
        left = right[np.arange(h)[:, None], src]
        sample = {
            "leftImage": left,
            "rightImage": right[:, self.max_disp:self.max_disp + w],
            "leftDisp": disp[..., None],
            "original_size": (h, w),
        }
        if self.with_right_disp:
            # Right-view GT: rightDisp[y, x - d] = d for the piecewise-
            # constant left-view field (exact away from band edges; band-
            # edge pixels inherit a neighbor band's value — fine for the
            # occlusion-eval tests, which only need a deterministic map).
            rdisp = np.zeros((h, w), np.float32)
            np.put_along_axis(
                rdisp, np.clip(xs[None, :] - disp, 0, w - 1).astype(np.int64),
                disp, axis=1)
            sample["rightDisp"] = rdisp[..., None]
        return sample

    def __getitem__(self, idx, rng=None):
        sample = self.load(idx)
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample


DATASETS = {
    "SceneFlow": SceneFlowDataset,
    "KITTI-2012": Kitti2012Dataset,
    "KITTI-2015": Kitti2015Dataset,
    "Synthetic": SyntheticStereoDataset,
}


def build_dataset(data_cfg, split, transform=None):
    """data_cfg: cfg['data']; split: 'train' | 'eval' | 'test' | 'vis'."""
    split_cfg = data_cfg.get(split, {})
    if data_cfg["type"] in ("FlyingChairs", "SyntheticFlow"):
        # flow datasets live in the flow package (lazy import: flow.datasets
        # imports data.io, so data.datasets must not import it at top level)
        from ..flow.datasets import FlyingChairsDataset, SyntheticFlowDataset
        if data_cfg["type"] == "SyntheticFlow":
            return SyntheticFlowDataset(
                transform=transform,
                **{k: v for k, v in split_cfg.items()
                   if k in ("length", "height", "width", "max_flow", "seed")})
        return FlyingChairsDataset(ann_file=split_cfg["annfile"],
                                   root=data_cfg["data_root"],
                                   transform=transform)
    cls = DATASETS[data_cfg["type"]]
    if cls is SyntheticStereoDataset:
        return cls(transform=transform,
                   **{k: v for k, v in split_cfg.items()
                      if k in ("length", "height", "width", "max_disp",
                               "seed")})
    return cls(ann_file=split_cfg["annfile"], root=data_cfg["data_root"],
               transform=transform,
               use_right_disp=split_cfg.get("use_right_disp", False))
