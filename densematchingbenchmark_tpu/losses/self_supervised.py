"""Self-supervised photometric losses: SSIM + inverse-warp (unsupervised).

Parity targets:
  dmb/modeling/stereo/losses/utils/ssim.py:5-37
  dmb/modeling/stereo/losses/inverse_warp_loss.py:8-141

Not used by shipped reference configs, but part of the loss inventory
(SURVEY.md §2.8): photometric reconstruction loss (RMS + SSIM) with
LR-consistency occlusion masking for training without GT disparity.
"""

import jax.numpy as jnp

from ..ops.warp import inverse_warp_2d
from ..ops.pooling import adaptive_avg_pool2d
from .common import masked_mean


def _box3(x):
    """3x3 mean filter with zero padding (F.avg_pool2d(x, 3, 1, 1))."""
    b, h, w, c = x.shape
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = sum(p[:, dy:dy + h, dx:dx + w] for dy in range(3)
              for dx in range(3))
    return out / 9.0


def ssim(x, y, mask=None, c1=0.01 ** 2, c2=0.03 ** 2):
    """Mean structural dissimilarity (1 - SSIM)/2 in [0, 1], masked."""
    mu_x, mu_y = _box3(x), _box3(y)
    sigma_x = _box3(x * x) - mu_x * mu_x
    sigma_y = _box3(y * y) - mu_y * mu_y
    sigma_xy = _box3(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    d = jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)
    if mask is not None:
        return masked_mean(d, mask)
    return jnp.mean(d)


def lr_consistency_mask(est_left_disp, est_right_disp, theta=1.0, eps=1e-6):
    """Non-occlusion masks from left-right disparity consistency.

    Returns (left_mask, right_mask), 1 = consistent (not occluded).
    """
    left_from_warp = inverse_warp_2d(est_right_disp, -est_left_disp)
    right_from_warp = inverse_warp_2d(est_left_disp, est_right_disp)
    left_occ = (jnp.abs(left_from_warp - est_left_disp) > theta) | \
        (jnp.abs(left_from_warp) < eps)
    right_occ = (jnp.abs(right_from_warp - est_right_disp) > theta) | \
        (jnp.abs(right_from_warp) < eps)
    return (~left_occ).astype(est_left_disp.dtype), \
        (~right_occ).astype(est_right_disp.dtype)


def inverse_warp_loss(est_disps, left_image, right_image, weights=None,
                      ssim_weight=0.15, rms_weight=0.85, eps=1e-6,
                      mask=None):
    """Photometric loss per level: rms_w * charbonnier + ssim_w * DSSIM.

    est_disps: list of [B, h, w, 1] left-view disparities (best first).
    Returns {'warp_loss_lvl{i}': scalar}.
    """
    if not isinstance(est_disps, (list, tuple)):
        est_disps = [est_disps]
    if weights is None:
        weights = [1.0] * len(est_disps)
    out = {}
    for i, disp in enumerate(est_disps):
        h, w = disp.shape[1:3]
        li = adaptive_avg_pool2d(left_image, h, w)
        ri = adaptive_avg_pool2d(right_image, h, w)
        warped = inverse_warp_2d(ri, -disp)
        charb = jnp.sqrt((li - warped) ** 2 + eps)
        m = mask if mask is not None else jnp.ones_like(li, bool)
        loss = rms_weight * masked_mean(charb, m) + \
            ssim_weight * ssim(li, warped, m)
        out[f"warp_loss_lvl{i}"] = weights[i] * loss
    return out
