"""Shared loss plumbing: multi-scale GT rescaling and masked means.

Every reference loss rescales the full-resolution GT disparity to each
prediction level (dividing values by the scale factor) with avg-pool for
dense GT and max-pool for sparse GT, then masks GT outside
(start_disp, max_disp / scale) — KITTI's invalid pixels are encoded as 0
(e.g. smooth_l1_loss.py:28-53). These are jit-safe: the "no valid pixel"
fallbacks become where/maximum instead of Python branches.
"""

import jax.numpy as jnp

from ..ops.pooling import adaptive_avg_pool2d, adaptive_max_pool2d


def rescale_gt(gt_disp, out_h, out_w, sparse=False):
    """Rescale GT disparity [B, H, W, 1] to (out_h, out_w).

    Returns (scaled_gt, scale) where scale = W_gt / out_w and disparity
    values are divided by scale (disparity shrinks with image width).
    """
    scale = gt_disp.shape[2] / float(out_w)
    if gt_disp.shape[1] == out_h and gt_disp.shape[2] == out_w:
        return gt_disp, 1.0
    scaled = gt_disp / scale
    pool = adaptive_max_pool2d if sparse else adaptive_avg_pool2d
    return pool(scaled, out_h, out_w), scale


def valid_mask(scaled_gt, max_disp_at_scale, start_disp=0):
    """Boolean validity mask (start_disp, max_disp_at_scale), exclusive."""
    return (scaled_gt > start_disp) & (scaled_gt < max_disp_at_scale)


def masked_mean(x, mask):
    """sum(x * mask) / max(count, 1) — the reference's safe masked mean."""
    maskf = mask.astype(x.dtype)
    return jnp.sum(x * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)
