"""Soft-argmin disparity regression family.

Parity targets:
  dmb/modeling/stereo/disp_predictors/soft_argmin.py:5-89
  dmb/modeling/stereo/disp_predictors/faster_soft_argmin.py:6-89
  dmb/modeling/stereo/disp_predictors/local_soft_argmin.py:5-123

The reference's SoftArgmin and FasterSoftArgmin compute the same expectation;
"Faster" only bakes the disparity weights into a frozen Conv3d because torch
dispatches that faster on GPU. On TPU the plain softmax + weighted sum fuses
into a single VPU pass under XLA, so there is one implementation. A Pallas
fused softmax-expectation kernel can later slot in behind the same signature.
"""

import jax
import jax.numpy as jnp

from .cost_volume import disp_sample_values


def soft_argmin(cost_volume, disp_sample=None, max_disp=None, start_disp=0,
                dilation=1, alpha=1.0, normalize=True):
    """Expected disparity under softmax(cost * alpha) over the D axis.

    Args:
      cost_volume: [B, D, H, W] matching scores (higher = more similar).
      disp_sample: per-pixel samples [B, D, H, W]; if None, uses the uniform
        range defined by (max_disp, start_disp, dilation).
      alpha: temperature multiplier on the cost.
      normalize: if False, treats cost_volume as already-normalized
        probabilities (no softmax).

    Returns:
      [B, H, W, 1] disparity map.
    """
    b, d, h, w = cost_volume.shape
    prob = cost_volume.astype(jnp.float32) * alpha
    if normalize:
        prob = jax.nn.softmax(prob, axis=1)
    if disp_sample is None:
        assert max_disp is not None, "need max_disp when disp_sample is None"
        vals = disp_sample_values(max_disp, start_disp, dilation)
        assert len(vals) == d, (
            f"cost volume has {d} samples, range defines {len(vals)}")
        disp_sample = jnp.asarray(vals, dtype=prob.dtype)[None, :, None, None]
    disp = jnp.sum(prob * disp_sample, axis=1)
    return disp[..., None]


def phase_soft_argmin(phase_cost, pack=1, alpha=1.0, normalize=True):
    """Soft-argmin evaluated directly on a PHASE-FORM full-res cost.

    Input layout = ops/conv3d.conv3d_transpose_s2_c1_phase_form: channel
    ``r*8 + pd*4 + ph*2 + pw`` of depth block ``q`` is cost voxel
    ``(d, y, x) = (2*(pack*q + r) + pd, 2h + ph, 2w + pw)``. The softmax +
    expectation over d is separable per spatial phase (each output pixel
    belongs to exactly one (ph, pw)), so the reduction runs over the
    (q, r, pd) axes in the phase layout — elementwise VPU work with no
    relayout — and only the 4 FINAL [B, H, W] disparity maps get pixel-
    shuffled (1.9M floats vs the 92M-voxel volume at 384x1248).

    Matches soft_argmin(volume, max_disp=2*pack*Dq, start_disp=0,
    dilation=1, alpha, normalize) on the materialized volume exactly
    (modulo float association); parity: faster_soft_argmin.py:6-89.

    Args:
      phase_cost: [B, Dq, H, W, pack*8].

    Returns:
      [B, 2H, 2W, 1] disparity map.
    """
    b, dq, h, w, c = phase_cost.shape
    assert c == pack * 8, (phase_cost.shape, pack)
    # Split ONLY the minor dim: channel c = g*4 + s with g = (r, pd) the
    # depth sub-phase and s = (ph, pw) the spatial phase. A single
    # minor-dim split keeps the layout a bitcast (an earlier 8-axis
    # [.., pack, 2, 2, 2] reshape + f32 upcast cost ~6 ms/iter of copies
    # at 384x1248 on v5e); the input stays in its compute dtype until the
    # element-wise exp, which XLA fuses into the reduction.
    y = phase_cost.reshape(b, dq, h, w, pack * 2, 4)
    # disparity value per (q, g): 2*(pack*q + g//2) + g%2
    g = jnp.arange(pack * 2)
    dvals = (2 * pack * jnp.arange(dq, dtype=jnp.float32)[:, None]
             + (2 * (g // 2) + g % 2).astype(jnp.float32)[None, :])
    dvals = dvals[None, :, None, None, :, None]     # [1, Dq, 1, 1, G, 1]
    red = (1, 4)                                    # (q, g)
    if normalize:
        m = jnp.max(y, axis=red, keepdims=True)     # compute-dtype max
        e = jnp.exp((y.astype(jnp.float32) - m.astype(jnp.float32)) * alpha)
        z = jnp.sum(e, axis=red)
        num = jnp.sum(e * dvals, axis=red)
        disp = num / z                              # [B, H, W, 4]
    else:
        disp = jnp.sum(y.astype(jnp.float32) * alpha * dvals, axis=red)
    disp = disp.reshape(b, h, w, 2, 2)              # (ph, pw)
    disp = jnp.transpose(disp, (0, 1, 3, 2, 4))     # [B, H, ph, W, pw]
    return disp.reshape(b, 2 * h, 2 * w)[..., None]


def local_soft_argmin(cost_volume, max_disp, radius, start_disp=0, dilation=1,
                      radius_dilation=1, alpha=1.0):
    """Windowed soft-argmin around the argmax sample (eval-time predictor).

    Gathers a +-radius window (step ``radius_dilation``) of array indices
    around the per-pixel argmax, masks out-of-range entries with a large
    negative score, softmaxes within the window, and takes the expectation of
    the corresponding *real* disparities (start_disp + index * dilation).
    Non-differentiable (argmax), used at eval for unimodal-supervised models
    (AcfNet). Parity: local_soft_argmin.py:54-110.

    Returns:
      [B, H, W, 1] disparity map.
    """
    b, d, h, w = cost_volume.shape
    num = (max_disp + dilation - 1) // dilation
    assert d == num, f"cost volume D={d} inconsistent with range D={num}"

    cost_volume = cost_volume.astype(jnp.float32)
    max_index = jnp.argmax(cost_volume, axis=1)[:, None]  # [B, 1, H, W]
    offsets = jnp.arange(-radius * radius_dilation,
                         radius * radius_dilation + 1,
                         radius_dilation, dtype=jnp.int32)
    index_group = max_index + offsets[None, :, None, None]  # [B, 2r+1, H, W]
    in_range = (index_group >= 0) & (index_group <= d - 1)
    clipped = jnp.clip(index_group, 0, d - 1)
    gathered = jnp.take_along_axis(cost_volume, clipped, axis=1) * alpha
    masked = jnp.where(in_range, gathered, -10000.0 * alpha)
    prob = jax.nn.softmax(masked, axis=1)
    disp_vals = start_disp + clipped.astype(cost_volume.dtype) * dilation
    return jnp.sum(prob * disp_vals, axis=1)[..., None]


def soft_argmax_2d(score_volume, radius, dilation=1, normalizer=1.0):
    """Soft-argmax flow regression over a local 2-D displacement window.

    The flow analog of :func:`soft_argmin`: softmax over the displacement
    axis (the minor lane axis produced by
    ``ops.cost_volume.correlation2d_volume``), then the expectation against
    the (dx, dy) displacement grid. Differentiable; the reference registers
    no flow models (dmb/modeling/flow/models/__init__.py:2-4) so this is a
    capability extension, designed in the framework's cost->softmax->
    expectation idiom.

    Args:
      score_volume: [B, H, W, (2*radius+1)^2] matching scores, displacement
        axis row-major in (dy, dx).
      radius: window radius in samples.
      dilation: displacement step in pixels.
      normalizer: temperature divisor applied before the softmax.

    Returns:
      [B, H, W, 2] expected (u, v) displacement in pixels.
    """
    n = 2 * radius + 1
    assert score_volume.shape[-1] == n * n, (score_volume.shape, radius)
    prob = jax.nn.softmax(
        score_volume.astype(jnp.float32) / normalizer, axis=-1)
    offs = jnp.arange(-radius * dilation, radius * dilation + 1, dilation,
                      dtype=jnp.float32)
    dx = jnp.tile(offs, n)                      # row-major: dx varies fastest
    dy = jnp.repeat(offs, n)
    u = jnp.sum(prob * dx, axis=-1)
    v = jnp.sum(prob * dy, axis=-1)
    return jnp.stack([u, v], axis=-1)
