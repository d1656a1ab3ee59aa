"""Cost-volume construction (concat / difference / correlation).

TPU-first rebuild of the reference volume builders
(dmb/modeling/stereo/cost_processors/utils/{cat_fms,dif_fms,correlation1d_cost}.py).

Design notes (vs. the reference):
- The reference's slow path writes shifted slices into a zero tensor in a
  Python loop over disparities; its fast path materializes a [B,C,D,H,W]
  broadcast and runs a trilinear grid_sample. Here the fixed-range path is a
  static unrolled roll+mask per disparity (D is a compile-time constant, so
  XLA fuses the whole build into one kernel with no gather), and the
  per-pixel-sample path is a 1-D linear gather (ops/warp.py:inverse_warp_3d).
- Layout is channels-last: features [B, H, W, C] -> volume [B, D, H, W, C*k],
  putting C in the minor-most (lane) dimension for the MXU-facing 3-D convs
  that consume the volume. D is the second axis so it can be sharded across
  devices (disparity-parallel aggregation) without relayout.
- Reference quirk not reproduced: fast_cat_fms masks the *reference* features
  with ``(warped_target > 0)`` (cat_fms.py:80-81), which also zeroes pixels
  where a warped feature value happens to be <= 0. We mask by warp *validity*
  instead, which matches the reference's own slow/exact path (cat_fms.py:34-47).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from .warp import inverse_warp_3d


def disp_sample_values(max_disp, start_disp=0, dilation=1):
    """The disparity value of each volume slice, as a static numpy array.

    Matches torch.linspace(start, start + max_disp - 1, D) with
    D = (max_disp + dilation - 1) // dilation (e.g. soft_argmin.py:40-43).
    """
    end_disp = start_disp + max_disp - 1
    num = (max_disp + dilation - 1) // dilation
    return np.linspace(start_disp, end_disp, num, dtype=np.float32)


def _shifted_pairs(reference_fm, target_fm, max_disp, start_disp, dilation):
    """Yield (masked_ref, shifted_tgt) per integer disparity shift.

    For shift d: shifted_tgt[..., x, :] = target_fm[..., x - d, :] where the
    source column is in-frame, else 0; masked_ref zeroed on the same columns
    (parity with cat_fms.py:34-47 / dif_fms.py:36-44).
    """
    w = reference_fm.shape[2]
    xs = np.arange(w)
    for val in disp_sample_values(max_disp, start_disp, dilation):
        d = int(val)  # reference casts each sample to int for shifting
        valid = ((xs - d >= 0) & (xs - d <= w - 1)).astype(reference_fm.dtype)
        valid = jnp.asarray(valid)[None, None, :, None]  # [1,1,W,1]
        shifted = jnp.roll(target_fm, d, axis=2) * valid
        yield reference_fm * valid, shifted


def cat_volume(reference_fm, target_fm, max_disp, start_disp=0, dilation=1,
               disp_sample=None, compat_grid_sample=False):
    """Concatenation cost volume.

    Args:
      reference_fm, target_fm: [B, H, W, C] left/right features.
      max_disp, start_disp, dilation: search range (at feature scale).
      disp_sample: optional [B, D, H, W] per-pixel disparity samples; when
        given, the sub-pixel gather path is used (fast_cat_fms semantics).

    Returns:
      [B, D, H, W, 2C] volume; reference channels first.
    """
    if disp_sample is None:
        slices = [jnp.concatenate([r, t], axis=-1)
                  for r, t in _shifted_pairs(reference_fm, target_fm,
                                             max_disp, start_disp, dilation)]
        return jnp.stack(slices, axis=1)
    # warped already has zero-padding (per-tap) semantics; the reference
    # features are zeroed where the warp is not fully in-frame, matching the
    # exact path's validity region (boundary pixels get a partial target tap).
    warped, valid = inverse_warp_3d(target_fm, disp_sample,
                                    compat_grid_sample=compat_grid_sample)
    if compat_grid_sample:
        # bit-faithful reference masking quirk: ref zeroed wherever the
        # warped feature value is <= 0 (fast_cat_fms, cat_fms.py:80-81)
        ref = reference_fm[:, None] * (warped > 0).astype(warped.dtype)
        return jnp.concatenate([ref, warped], axis=-1)
    ref = reference_fm[:, None] * valid
    return jnp.concatenate([jnp.broadcast_to(ref, warped.shape), warped],
                           axis=-1)


def dif_volume(reference_fm, target_fm, max_disp, start_disp=0, dilation=1,
               disp_sample=None, normalize=False, p=1.0,
               compat_grid_sample=False):
    """Difference cost volume: ref - warped(target).

    Parity: dmb/modeling/stereo/cost_processors/utils/dif_fms.py:7-92.

    Returns:
      [B, D, H, W, C], or [B, D, H, W] if ``normalize`` (p-norm over C).
    """
    if disp_sample is None:
        slices = [r - t for r, t in _shifted_pairs(reference_fm, target_fm,
                                                   max_disp, start_disp, dilation)]
        vol = jnp.stack(slices, axis=1)
    else:
        warped, valid = inverse_warp_3d(target_fm, disp_sample,
                                        compat_grid_sample=compat_grid_sample)
        if compat_grid_sample:
            # bit-faithful reference masking quirk (dif_fms.py:80-84)
            vol = reference_fm[:, None] * (warped > 0).astype(warped.dtype) \
                - warped
        else:
            vol = reference_fm[:, None] * valid - warped
    if normalize:
        if p == 1.0:
            return jnp.sum(jnp.abs(vol), axis=-1)
        return jnp.sum(jnp.abs(vol) ** p, axis=-1) ** (1.0 / p)
    return vol


def correlation1d_volume(reference_fm, target_fm, max_disp, start_disp=0,
                         dilation=1, disp_sample=None, leaky_slope=0.1):
    """1-D correlation cost: per-disparity channel dot product.

    cost[b, d, y, x] = leaky_relu(sum_c ref[b,y,x,c] * tgt[b,y,x-d,c]).

    TPU-native replacement for the external CUDA
    `spatial_correlation_sampler` used by the reference
    (cost_processors/utils/correlation1d_cost.py:7-31): the patchwise
    correlation with patch (1, 2*max_disp-1) cropped to its left half is
    exactly a shifted channel dot. Note the reference keeps patch indices
    [0, max_disp) which order displacements from -(max_disp-1) to 0, i.e.
    its D axis runs disparity max_disp-1 -> 0; we return the conventional
    0 -> max_disp-1 ordering (flip if bit-parity is needed).

    Returns:
      [B, D, H, W].
    """
    if disp_sample is None:
        slices = [jnp.sum(r * t, axis=-1)
                  for r, t in _shifted_pairs(reference_fm, target_fm,
                                             max_disp, start_disp, dilation)]
        cost = jnp.stack(slices, axis=1)
    else:
        warped, _ = inverse_warp_3d(target_fm, disp_sample)
        cost = jnp.sum(reference_fm[:, None] * warped, axis=-1)
    return jnp.where(cost >= 0, cost, cost * leaky_slope)


def correlation2d_volume(reference_fm, target_fm, radius, dilation=1):
    """Local 2-D correlation volume for optical flow.

    cost[b, y, x, k] = mean_c(ref[b,y,x,c] * tgt[b, y+dy, x+dx, c]) for the
    (2*radius+1)^2 displacements (dy, dx) in row-major order, dy/dx in
    {-radius*dilation, ..., +radius*dilation} step ``dilation``; zero where
    the displaced sample falls outside the frame.

    The displacement axis lands in the minor (lane) dimension — e.g. 81
    lanes at radius 4 — so the downstream 2-D aggregation convs contract a
    lane-aligned axis on the MXU. This is the 2-D generalization of
    :func:`correlation1d_volume` (which replaces the reference's CUDA
    `spatial_correlation_sampler`); the reference registers no flow models,
    so this exceeds its capability.

    Returns:
      [B, H, W, (2*radius+1)^2].
    """
    b, h, w, c = reference_fm.shape
    r = radius * dilation
    padded = jnp.pad(target_fm, ((0, 0), (r, r), (r, r), (0, 0)))
    slices = []
    for dy in range(-r, r + 1, dilation):
        for dx in range(-r, r + 1, dilation):
            shifted = lax.dynamic_slice(
                padded, (0, r + dy, r + dx, 0), (b, h, w, c))
            slices.append(jnp.mean(reference_fm * shifted, axis=-1))
    return jnp.stack(slices, axis=-1)
