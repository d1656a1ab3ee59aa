"""Result saving: KITTI submission PNGs + color/group visualizations.

Parity target: dmb/visualization/stereo/save_result.py:12-37 — writes
  disp_0/<name>.png       uint16 x256 (KITTI submission format)
  color_disp/<name>.png   KITTI color ramp
  group_disp/<name>.png   2x2 panel (est/gt/err/left)
"""

import os
import os.path as osp

import numpy as np

from ..data.io import save_kitti_disp
from .colormap import disp_to_color, group_color


class SaveResultTool:
    def __init__(self, out_dir):
        self.out_dir = out_dir

    def __call__(self, name, est_disp, gt_disp=None, left_image=None):
        est_disp = np.asarray(est_disp)
        if est_disp.ndim == 4:
            est_disp = est_disp[0, ..., 0]
        elif est_disp.ndim == 3:
            est_disp = est_disp[..., 0]

        sub_dir = osp.join(self.out_dir, "disp_0")
        os.makedirs(sub_dir, exist_ok=True)
        save_kitti_disp(osp.join(sub_dir, f"{name}.png"), est_disp)

        color_dir = osp.join(self.out_dir, "color_disp")
        os.makedirs(color_dir, exist_ok=True)
        from imageio.v2 import imwrite
        imwrite(osp.join(color_dir, f"{name}.png"),
                np.clip(disp_to_color(est_disp), 0, 255).astype(np.uint8))

        if gt_disp is not None or left_image is not None:
            g = np.asarray(gt_disp) if gt_disp is not None else None
            if g is not None and g.ndim == 4:
                g = g[0, ..., 0]
            elif g is not None and g.ndim == 3:
                g = g[..., 0]
            li = np.asarray(left_image) if left_image is not None else None
            if li is not None and li.ndim == 4:
                li = li[0]
            grp_dir = osp.join(self.out_dir, "group_disp")
            os.makedirs(grp_dir, exist_ok=True)
            group_color(est_disp, g, li,
                        save_path=osp.join(grp_dir, f"{name}.png"))
