"""Stereo focal loss (unimodal cross-entropy on the cost volume).

Parity target: dmb/modeling/stereo/losses/stereo_focal_loss.py:9-153.
Cross-entropy between log_softmax(est_cost) and a Laplace GT probability
volume, focally weighted by (1 - P_gt)^(-coeff). The variance may be a
scalar (AcfNet-uniform) or a per-pixel map from the confidence network
(AcfNet-adaptive), per cost volume.
"""

import jax
import jax.numpy as jnp

from .common import rescale_gt, valid_mask
from ..ops.disp2prob import laplace_prob


def stereo_focal_loss(est_costs, gt_disp, max_disp, variance, start_disp=0,
                      dilation=1, weights=None, focal_coefficient=0.0,
                      sparse=False, disp_sample=None):
    """Returns {'stereo_focal_loss_lvl{i}': scalar}.

    Args:
      est_costs: list of [B, D, h, w] unnormalized cost volumes (best first).
      gt_disp: [B, H, W, 1] full-res GT.
      variance: scalar / [B, H, W, 1] map / list thereof (one per level).
      dilation: int or list per level (GT prob volume sample step).
      disp_sample: optional per-pixel samples [B, D, h, w] or list per level.
    """
    if not isinstance(est_costs, (list, tuple)):
        est_costs = [est_costs]
    n = len(est_costs)
    if weights is None:
        weights = [1.0] * n
    if not isinstance(weights, (list, tuple)):
        weights = [weights] * n
    if not isinstance(dilation, (list, tuple)):
        dilation = [dilation] * n
    if not isinstance(variance, (list, tuple)):
        variance = [variance] * n
    if not isinstance(disp_sample, (list, tuple)):
        disp_sample = [disp_sample] * n

    out = {}
    for i, (cost, var, dil, ds) in enumerate(
            zip(est_costs, variance, dilation, disp_sample)):
        b, d, h, w = cost.shape
        sgt, scale = rescale_gt(gt_disp, h, w, sparse)
        mask = valid_mask(sgt, start_disp + int(max_disp / scale), start_disp)
        maskf = mask.astype(jnp.float32)
        # GT probability volume; laplace_prob applies its own interior mask
        # (start, start + max/scale - 1) like the reference's Disp2Prob.
        gt_prob = laplace_prob(sgt * maskf, int(max_disp / scale),
                               variance=var, start_disp=start_disp,
                               dilation=dil, disp_sample=ds)
        log_prob = jax.nn.log_softmax(cost.astype(jnp.float32), axis=1)
        focal_w = jnp.power(1.0 - gt_prob, -focal_coefficient)
        per_px = -(gt_prob * log_prob) * focal_w * maskf[:, None, :, :, 0]
        denom = jnp.maximum(jnp.sum(maskf), 1.0)
        out[f"stereo_focal_loss_lvl{i}"] = weights[i] * jnp.sum(per_px) / denom
    return out
