"""Disparity-map losses: smooth-L1, GERF, confidence-NLL, quantile.

Parity targets:
  dmb/modeling/stereo/losses/smooth_l1_loss.py:6-93
  dmb/modeling/stereo/losses/gerf_loss.py:6-99
  dmb/modeling/stereo/losses/conf_nll_loss.py:6-89
  dmb/modeling/stereo/losses/utils/quantile_loss.py:5-40

All are multi-scale: they take a list of predictions (best first) plus the
full-res GT, rescale GT per level, and return a dict of weighted per-level
scalars. Pure functions of arrays — jit/grad-safe.
"""

import jax.numpy as jnp

from .common import rescale_gt, valid_mask, masked_mean


def _per_level(est_list, weights, name, fn):
    if not isinstance(est_list, (list, tuple)):
        est_list = [est_list]
    if weights is None:
        weights = [1.0] * len(est_list)
    return {f"{name}_lvl{i}": weights[i] * fn(est)
            for i, est in enumerate(est_list)}


def smooth_l1_loss(est_disps, gt_disp, max_disp, start_disp=0, weights=None,
                   sparse=False):
    """Masked smooth-L1 (huber, beta=1) per level -> {'l1_loss_lvl{i}': ...}."""
    def level(est):
        sgt, scale = rescale_gt(gt_disp, est.shape[1], est.shape[2], sparse)
        mask = valid_mask(sgt, max_disp / scale, start_disp)
        diff = jnp.abs(est - sgt)
        huber = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        return masked_mean(huber, mask)
    return _per_level(est_disps, weights, "l1_loss", level)


def gerf_loss(est_disps, gt_disp, max_disp, start_disp=0, weights=None,
              sparse=False):
    """Generalized robust error: sqrt((gt-est)^2 * mask + 4)/2 - 1, averaged
    over valid pixels. Masked pixels contribute exactly 0 (sqrt(4)/2 - 1),
    so summing all pixels matches the reference (gerf_loss.py:58-63)."""
    def level(est):
        sgt, scale = rescale_gt(gt_disp, est.shape[1], est.shape[2], sparse)
        mask = valid_mask(sgt, max_disp / scale, start_disp)
        maskf = mask.astype(est.dtype)
        per_px = jnp.sqrt(jnp.square(sgt - est) * maskf + 4.0) / 2.0 - 1.0
        return jnp.sum(per_px) / jnp.maximum(jnp.sum(maskf), 1.0)
    return _per_level(est_disps, weights, "gerf_loss", level)


def conf_nll_loss(est_conf_costs, gt_disp, max_disp, start_disp=0,
                  weights=None, sparse=False):
    """-log(sigmoid(conf_cost)) over valid-GT pixels -> {'conf_loss_lvl{i}'}.

    Takes the *pre-sigmoid* confidence cost (the reference feeds conf_costs,
    cmn/cmn.py:76-80) so log-sigmoid is numerically stable.
    """
    def level(conf_cost):
        sgt, scale = rescale_gt(gt_disp, conf_cost.shape[1],
                                conf_cost.shape[2], sparse)
        mask = valid_mask(sgt, max_disp / scale, start_disp)
        nll = jnp.logaddexp(0.0, -conf_cost)  # -log(sigmoid(x))
        return masked_mean(nll, mask)
    return _per_level(est_conf_costs, weights, "conf_loss", level)


def quantile_loss(min_est_disp, max_est_disp, gt_disp, max_disp, start_disp=0,
                  weight=1.0, theta=0.05):
    """DeepPruner pinball loss forcing minDisp <= gt <= maxDisp.

    Parity: utils/quantile_loss.py:5-40. Returns a scalar.
    """
    mask = (gt_disp > start_disp) & (gt_disp < (start_disp + max_disp))
    diff_min = gt_disp - min_est_disp
    min_term = diff_min * (theta - (diff_min < 0).astype(gt_disp.dtype))
    diff_max = gt_disp - max_est_disp
    max_term = diff_max * ((1.0 - theta) - (diff_max < 0).astype(gt_disp.dtype))
    return (masked_mean(min_term, mask) + masked_mean(max_term, mask)) * weight
