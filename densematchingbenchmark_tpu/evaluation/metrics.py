"""On-device disparity error metrics (EPE, n-px error, occlusion split).

Parity targets:
  dmb/data/datasets/evaluation/stereo/pixel_error.py:6-73 (calc_error)
  dmb/data/datasets/evaluation/stereo/eval.py:74-134 (occlusion eval)
  dmb/data/datasets/evaluation/stereo/eval.py:12-37 (remove_padding)

Unlike the reference (which copies tensors to CPU per sample), these metrics
are pure jnp functions that run on-device inside jit and return scalars, so
distributed evaluation is a psum/mean over device-resident values.
"""

import jax.numpy as jnp

from ..ops.warp import inverse_warp_2d

PX_THRESHOLDS = (1, 2, 3, 5)


def calc_error(est_disp, gt_disp, lb=None, ub=None, extra_mask=None,
               per_sample=False):
    """EPE + {1,2,3,5}-px error %% over GT pixels in (lb, ub).

    Args:
      est_disp, gt_disp: same-shape disparity maps (any layout).
      lb, ub: exclusive valid-GT bounds (KITTI invalid = 0 needs lb=0).
      extra_mask: optional boolean mask AND-ed into validity (occlusion split).
      per_sample: reduce over all axes except the leading batch axis,
        returning [B] vectors — the batched-eval path needs per-sample
        means so batch-N evaluation averages exactly like the reference's
        per-sample loop (tools/test.py:101-169).

    Returns:
      dict of scalar (or [B], per_sample=True) jnp arrays: '1px','2px',
      '3px','5px' in percent, 'epe'. Zeros when no pixel is valid
      (reference behavior).
    """
    axes = tuple(range(1, gt_disp.ndim)) if per_sample else None
    mask = jnp.ones(gt_disp.shape, dtype=bool)
    if lb is not None:
        mask = mask & (gt_disp > lb)
    if ub is not None:
        mask = mask & (gt_disp < ub)
    if extra_mask is not None:
        mask = mask & extra_mask
    maskf = mask.astype(jnp.float32)
    total = jnp.sum(maskf, axis=axes)
    denom = jnp.maximum(total, 1.0)
    any_valid = (total >= 1.0).astype(jnp.float32)

    abs_error = jnp.abs(gt_disp.astype(jnp.float32) -
                        est_disp.astype(jnp.float32)) * maskf
    out = {}
    for t in PX_THRESHOLDS:
        frac = jnp.sum(((abs_error > t) & mask).astype(jnp.float32),
                       axis=axes) / denom
        out[f'{t}px'] = frac * 100.0 * any_valid
    out['epe'] = jnp.sum(abs_error, axis=axes) / denom * any_valid
    return out


def occlusion_mask(ref_gt_disp, target_gt_disp, theta=1.0, eps=1e-6,
                   compat_grid_sample=False):
    """LR-consistency occlusion mask: 1 = occluded.

    Warps the right GT disparity to the left view with -left_disp; a pixel is
    occluded if the warped value disagrees by > theta or the warp landed on
    padding. Parity: eval.py:115-121.

    Args:
      ref_gt_disp, target_gt_disp: [B, H, W, 1] left/right GT disparity.
      compat_grid_sample: use the reference's biased grid_sample warp
        (see ops/warp.inverse_warp_2d) so the occ/noc split is bit-faithful
        to eval.py:115-121; the default is the mathematically exact warp
        (documented divergence, DESIGN.md §4).

    Returns:
      [B, H, W, 1] float mask.
    """
    warped = inverse_warp_2d(target_gt_disp, -ref_gt_disp,
                             compat_grid_sample=compat_grid_sample)
    occ = (jnp.abs(warped - ref_gt_disp) > theta) | (jnp.abs(warped) < eps)
    return occ.astype(ref_gt_disp.dtype)


def calc_error_with_occlusion(est_disp, ref_gt_disp, target_gt_disp, lb, ub,
                              per_sample=False, compat_grid_sample=False):
    """occ_/noc_-prefixed error dicts via LR-consistency split.

    Parity note: the reference multiplies disparities by the mask and re-runs
    calc_error, so masked-out pixels fail the (lb, ub) validity check; the
    effect equals AND-ing the mask into validity (with lb >= 0), which is
    what we do directly (tests/test_reference_metric_parity.py checks both
    against the live reference).
    """
    occ = occlusion_mask(ref_gt_disp, target_gt_disp,
                         compat_grid_sample=compat_grid_sample) > 0.5
    out = {}
    for key, val in calc_error(est_disp, ref_gt_disp, lb, ub,
                               extra_mask=occ,
                               per_sample=per_sample).items():
        out['occ_' + key] = val
    for key, val in calc_error(est_disp, ref_gt_disp, lb, ub,
                               extra_mask=~occ,
                               per_sample=per_sample).items():
        out['noc_' + key] = val
    return out


def remove_padding(x, height, width):
    """Crop eval padding back to the original size (pad was top + right).

    Parity: eval.py:12-37 — keep the bottom ``height`` rows and the left
    ``width`` columns. Works on [B, H, W, C] arrays.
    """
    pad_top = x.shape[1] - height
    return x[:, pad_top:, :width, :]
