"""Ground-truth disparity -> probability volume (Laplace/Gaussian/one-hot).

Parity target: dmb/modeling/stereo/losses/utils/disp2prob.py:11-206.
Used by the stereo focal loss (AcfNet unimodal supervision): the GT disparity
map becomes a unimodal distribution over the disparity samples, optionally
with a per-pixel variance (from the confidence network).

Functional API: the mask/eps plumbing of the reference's Disp2Prob.getProb is
reproduced exactly — out-of-range GT pixels are masked to 0 before the
distance computation and their probability rows become ``eps``.
"""

import jax
import jax.numpy as jnp

from .cost_volume import disp_sample_values

EPS = 1e-40


def _prep(gt_disp, max_disp, start_disp, dilation, disp_sample, dtype):
    """Common mask + sample-broadcast logic (disp2prob.py:107-137)."""
    if gt_disp.ndim == 4:  # [B, H, W, 1] -> [B, 1, H, W]
        gt = gt_disp[..., 0][:, None]
    else:
        gt = gt_disp[:, None]
    end_disp = start_disp + max_disp - 1
    mask = (gt > start_disp) & (gt < end_disp)
    mask = mask.astype(dtype)
    gt = gt * mask
    if disp_sample is None:
        vals = disp_sample_values(max_disp, start_disp, dilation)
        disp_sample = jnp.asarray(vals, dtype=dtype)[None, :, None, None]
    return gt, mask, disp_sample


def laplace_prob(gt_disp, max_disp, variance=1.0, start_disp=0, dilation=1,
                 disp_sample=None):
    """softmax_D(-|d_s - gt| / variance) * mask + eps  ->  [B, D, H, W].

    ``variance`` may be a scalar or a per-pixel map [B, H, W, 1] (AcfNet
    adaptive). Parity: LaplaceDisp2Prob (disp2prob.py:160-175).
    """
    dtype = jnp.result_type(gt_disp, jnp.float32)
    gt, mask, samples = _prep(gt_disp, max_disp, start_disp, dilation,
                              disp_sample, dtype)
    if isinstance(variance, jnp.ndarray) and variance.ndim == 4:
        variance = variance[..., 0][:, None]  # [B, 1, H, W]
    cost = -jnp.abs(samples - gt) / variance
    return jax.nn.softmax(cost, axis=1) * mask + EPS


def gaussian_prob(gt_disp, max_disp, variance=1.0, start_disp=0, dilation=1,
                  disp_sample=None):
    """softmax_D(-(d_s - gt)^2 / variance) * mask + eps.

    Parity: GaussianDisp2Prob (disp2prob.py:178-193).
    """
    dtype = jnp.result_type(gt_disp, jnp.float32)
    gt, mask, samples = _prep(gt_disp, max_disp, start_disp, dilation,
                              disp_sample, dtype)
    if isinstance(variance, jnp.ndarray) and variance.ndim == 4:
        variance = variance[..., 0][:, None]
    cost = -jnp.square(jnp.abs(samples - gt)) / variance
    return jax.nn.softmax(cost, axis=1) * mask + EPS


def onehot_prob(gt_disp, max_disp, variance=1.0, start_disp=0, dilation=1,
                disp_sample=None):
    """1 where |d_s - gt| < variance else 0 (no masking, no eps).

    Parity: OneHotDisp2Prob.getProb (disp2prob.py:196-206) — note the
    reference's one-hot variant intentionally skips the range mask.
    """
    dtype = jnp.result_type(gt_disp, jnp.float32)
    gt, _, samples = _prep(gt_disp, max_disp, start_disp, dilation,
                           disp_sample, dtype)
    if gt_disp.ndim == 4:
        gt = gt_disp[..., 0][:, None]
    else:
        gt = gt_disp[:, None]
    return (jnp.abs(samples - gt) < variance).astype(dtype)
