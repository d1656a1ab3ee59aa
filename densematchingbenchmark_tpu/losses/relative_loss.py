"""Relative-rank depth loss ("Surface Normals in the Wild").

Parity target: dmb/modeling/stereo/losses/relative_loss.py:6-112 (inventory
item; unused by shipped reference configs). For labeled pixel pairs:
  label != 0: soft-margin (logistic) loss on the signed disparity
    difference — encourages correct relative ordering;
  label == 0: squared difference — encourages equality.
Over-large differences (|diff| > 66) fall back to a linear term to keep
exp() finite (the reference's workaround, relative_loss.py:64-75).
"""

import jax.numpy as jnp

from .common import rescale_gt, valid_mask


def relative_loss(est_disps, gt_disp, labels, max_disp, start_disp=0,
                  weights=None, sparse=False):
    """Returns {'relative_loss_lvl{i}': scalar}.

    labels: relative-rank labels, same shape as gt ([B, H, W, 1]);
      +1 / -1 = rank order, 0 = equal.
    """
    if not isinstance(est_disps, (list, tuple)):
        est_disps = [est_disps]
    if not isinstance(labels, (list, tuple)):
        labels = [labels] * len(est_disps)
    if weights is None:
        weights = [1.0] * len(est_disps)

    out = {}
    for i, (est, label) in enumerate(zip(est_disps, labels)):
        sgt, scale = rescale_gt(gt_disp, est.shape[1], est.shape[2], sparse)
        mask = valid_mask(sgt, max_disp / scale, start_disp)
        maskf = mask.astype(est.dtype)
        diff = (sgt - est) * maskf
        proper = (jnp.abs(diff) <= 66.0) & mask
        over = (jnp.abs(diff) > 66.0) & mask

        # soft-margin where ordered, squared where label == 0
        ordered = label != 0
        sm = jnp.log1p(jnp.exp(-label * diff))
        sq = diff * diff
        per_px = jnp.where(ordered, sm, sq) * proper.astype(est.dtype)
        per_px = per_px + jnp.abs(diff) * over.astype(est.dtype)
        denom = jnp.maximum(jnp.sum(maskf), 1.0)
        out[f"relative_loss_lvl{i}"] = weights[i] * jnp.sum(per_px) / denom
    return out
