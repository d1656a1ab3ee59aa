"""StereoNet configs.

Parity: configs/StereoNet/scene_flow_8x_2stage.py (Difference volume at 1/8,
1 refinement stage) and scene_flow_8x_4stage.py (3 refinement stages).
"""

import copy

from .psmnet import _apply_overrides, _BASE


def _base(refine_num=1):
    cfg = copy.deepcopy(_BASE)
    cfg["model"].update(
        backbone=dict(type="StereoNet", in_planes=3, downsample_num=3,
                      residual_num=6),
        cost_processor=dict(
            type="Difference",
            cost_computation=dict(max_disp=24, start_disp=0, dilation=1),
            # pack=4: D-packed trunk (24 rows -> 6 at 128-lane convs);
            # same params, MXU schedule change (ops/conv3d.py)
            cost_aggregator=dict(type="StereoNet", max_disp=192, num=4,
                                 pack=4),
        ),
        disp_predictor=dict(type="FASTER", max_disp=24, start_disp=0,
                            dilation=1, alpha=1.0, normalize=True),
        # pack=4: full-res edge-aware trunk in the row-packed layout
        # (ops/conv3d.conv2d_rowpacked; same params). Measured on v5e:
        # 4-stage 40.4 -> 19.5 ms (24.7 -> 51.2 FPS, 2.07x) at 384x1248.
        # Requires H % 4 == 0 (shipped shapes all qualify).
        disp_refinement=dict(type="StereoNet", num=refine_num, pack=4),
        losses=dict(
            # reference: weights (1.0, 0.5[, ...]) over [refined..., init]
            l1_loss=dict(max_disp=192,
                         weights=tuple([1.0] + [0.5] * refine_num),
                         weight=1.0),
        ),
    )
    cfg["data"]["batch_size_per_device"] = 4
    cfg["lr_schedule"]["step"] = (11,)
    cfg["total_epochs"] = 11
    cfg["eval_disparity_id"] = (0, 1)
    return cfg


def scene_flow_8x_2stage(**overrides):
    return _apply_overrides(_base(1), overrides)


def scene_flow_8x_4stage(**overrides):
    cfg = _base(3)
    cfg["eval_disparity_id"] = (0, 1, 2, 3)
    return _apply_overrides(cfg, overrides)
