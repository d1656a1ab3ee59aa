"""AnyNet meta-architecture: 3-stage coarse-to-fine + SPN refinement.

Parity target: dmb/modeling/stereo/models/AnyNet.py:12-147 and
dmb/modeling/stereo/cost_processors/AnyNet.py:8-78:
  stage 1 (init_guess): full-range difference volume at 1/16, soft-argmin.
  stage 2/3 (warp_level_8/4): residual search — disparity samples
    (start_disp=-2, max_disp=5) centered on the upsampled previous
    disparity, per-pixel warped difference volume, residual soft-argmin
    added to the upsampled previous estimate.
  refinement: SPN propagation at 1/4 (refinement/anynet.py).
Outputs best-first: [refined_4, disp_4, disp_8, disp_16], all upsampled to
full resolution with values scaled by the width ratio.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from .aggregators.anynet import AnyNetAggregator
from ..ops.cost_volume import dif_volume, disp_sample_values
from ..ops.soft_argmin import soft_argmin
from ..ops.interpolate import upsample_2d

STAGES = ("init_guess", "warp_level_8", "warp_level_4")


class AnyNet(nn.Module):
    backbone: nn.Module
    disp_refinement: Optional[nn.Module]
    max_disp: int = 192
    stage_max_disp: Dict[str, int] = None     # per-stage search range
    stage_start_disp: Dict[str, int] = None
    stage_dilation: Dict[str, int] = None
    stage_agg_planes: Dict[str, int] = None
    agg_num: int = 4
    alpha: float = 1.0
    batch_norm: bool = True
    dtype: Any = jnp.float32
    # reproduce the reference's grid_sample warp numerics exactly (for
    # reference-checkpoint reuse); the exact warp is the default
    compat_warp: bool = False

    def setup(self):
        self.aggregators = {
            st: AnyNetAggregator(
                agg_planes=self.stage_agg_planes[st], num=self.agg_num,
                batch_norm=self.batch_norm, dtype=self.dtype,
                name=f"agg_{st}")
            for st in STAGES}

    def _stage(self, st, left, right, prev_disp, train):
        b, h, w, _ = left.shape
        maxd = self.stage_max_disp[st]
        vals = disp_sample_values(maxd, self.stage_start_disp[st],
                                  self.stage_dilation[st])
        disp_sample = jnp.broadcast_to(
            jnp.asarray(vals)[None, :, None, None], (b, len(vals), h, w))
        if prev_disp is not None:
            scale = w / prev_disp.shape[2]
            up = upsample_2d(prev_disp * scale, h, w,
                             align_corners=False)
            disp_sample = disp_sample + up[..., 0][:, None]
        else:
            up = None
        raw = dif_volume(left, right, maxd, disp_sample=disp_sample,
                         compat_grid_sample=self.compat_warp)
        cost = self.aggregators[st](raw.astype(self.dtype), train=train)[0]
        # residual stages regress the *offset* samples; init regresses
        # absolute disparity (the samples ARE the absolute values there)
        if up is None:
            disp = soft_argmin(cost, max_disp=maxd,
                               start_disp=self.stage_start_disp[st],
                               dilation=self.stage_dilation[st],
                               alpha=self.alpha)
        else:
            vals_only = jnp.broadcast_to(
                jnp.asarray(vals)[None, :, None, None], cost.shape)
            disp = soft_argmin(cost, disp_sample=vals_only,
                               alpha=self.alpha) + up
        return cost, disp

    def __call__(self, left, right, train: bool = False):
        (l16, l8, l4), (r16, r8, r4) = self.backbone(left, right,
                                                     train=train)
        cost16, disp16 = self._stage("init_guess", l16, r16, None, train)
        cost8, disp8 = self._stage("warp_level_8", l8, r8, disp16, train)
        cost4, disp4 = self._stage("warp_level_4", l4, r4, disp8, train)

        disps = [disp4]
        if self.disp_refinement is not None:
            disps = self.disp_refinement(disps, l4, r4, left, right,
                                         train=train)
        disps = disps + [disp8, disp16]

        h, w = left.shape[1:3]
        disps = [upsample_2d(d * (w / d.shape[2]), h, w,
                             align_corners=False) for d in disps]
        return {"disps": disps, "costs": [cost4, cost8, cost16]}
