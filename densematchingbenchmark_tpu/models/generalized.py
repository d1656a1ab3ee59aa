"""GeneralizedStereoModel: backbone -> cost processor -> predictor
[-> refinement] [-> confidence].

Parity target: dmb/modeling/stereo/models/general_stereo_model.py:14-92,
with one structural change: losses live *outside* the module. The module is
a pure function from (left, right) to
  {'disps': [...], 'costs': [...], 'variances': [...], 'conf_costs': [...],
   'confs': [...]}
(best-first lists, "we always keep the better disparity map ahead" —
disp_refinement/AnyNet.py:93-94), and the functional loss evaluator consumes
that dict plus the GT. This keeps the forward jit-able for inference and
lets the train step take grads through a single pure apply.
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .predictors import DispPredictor
from ..ops.interpolate import upsample_3d


class GeneralizedStereoModel(nn.Module):
    backbone: nn.Module
    cost_processor: nn.Module
    disp_predictor: DispPredictor
    cmn: Optional[nn.Module] = None
    disp_refinement: Optional[nn.Module] = None
    # With an aggregator built in return_low_res mode, fuse the trilinear
    # upsample + soft-argmin into one Pallas kernel at eval time (the
    # full-res cost volume is never materialized; eval 'costs' are then the
    # LOW-RES volumes). Training keeps the XLA upsample path for autodiff.
    fused_upsample_argmin: bool = False
    # With a GCNet aggregator in phase_argmin mode, the cost head arrives
    # in phase layout [B, D/pack, H, W, pack*8] and the disparity is read
    # out by ops/soft_argmin.phase_soft_argmin (the full-res volume is
    # never materialized; eval 'costs' are the PHASE-FORM volumes —
    # ops/conv3d.phase_cost_to_volume materializes one for inspection).
    phase_argmin: bool = False
    max_disp: int = 192

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        ref_fms, tgt_fms = self.backbone(left, right, train=train)
        costs = self.cost_processor(ref_fms, tgt_fms, train=train)
        if self.fused_upsample_argmin:
            h, w = left.shape[1:3]
            p = self.disp_predictor
            if train:
                costs = [upsample_3d(c, self.max_disp, h, w,
                                     align_corners=True) for c in costs]
                disps = [p(cost) for cost in costs]
            else:
                from ..ops.pallas import fused_upsample_soft_argmin
                disps = [fused_upsample_soft_argmin(
                    c, self.max_disp, h, w, start_disp=p.start_disp,
                    dilation=p.dilation, alpha=p.alpha) for c in costs]
        elif self.phase_argmin:
            from ..ops.soft_argmin import phase_soft_argmin
            from ..ops.conv3d import phase_cost_to_volume
            p = self.disp_predictor
            disps = [phase_soft_argmin(c, pack=c.shape[-1] // 8,
                                       alpha=p.alpha, normalize=p.normalize)
                     for c in costs]
            # Materialized volumes for the 'costs' output: pure relayout,
            # DEAD-CODE-ELIMINATED whenever the caller only consumes disps
            # (bench, eval metrics, train loss) and materialized only for
            # the visualization/view_cost paths that index costs.
            costs = [phase_cost_to_volume(c, pack=c.shape[-1] // 8)
                     for c in costs]
        else:
            disps = [self.disp_predictor(cost) for cost in costs]

        if self.disp_refinement is not None:
            disps = self.disp_refinement(disps, ref_fms, tgt_fms, left, right,
                                         train=train)

        out = {"disps": disps, "costs": costs}
        if self.cmn is not None:
            variances, confs, conf_costs = self.cmn(costs, train=train)
            out.update(variances=variances, confs=confs,
                       conf_costs=conf_costs)
        return out
