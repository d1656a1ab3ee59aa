"""Differentiable disparity warps (the core gather of dense matching).

TPU-first reimplementation of the reference's grid_sample-based warps
(reference: dmb/modeling/stereo/layers/inverse_warp.py:4-42 and
inverse_warp_3d.py:4-52). Instead of building a normalized [-1, 1] grid and
calling a generic trilinear grid_sample, we exploit the structure of stereo
warping: the sample location only moves along the width axis, so a warp is a
1-D linear-interpolated gather along W with zero padding outside the frame.
This keeps the op a pair of `take_along_axis` gathers that XLA lowers to
efficient dynamic-gathers, and the gradient is exact (piecewise-linear).

Note on parity: the reference calls `F.grid_sample` without `align_corners`
(default False in modern torch) while normalizing coordinates with the
align_corners=True formula, which introduces a sub-pixel bias. We implement
the mathematically exact warp (equivalent to align_corners=True); the slow
reference path (integer shifting in cat_fms) agrees with us exactly.
"""

import jax
import jax.numpy as jnp


def gather_1d_linear(src, x, axis):
    """Linear-interpolated gather along ``axis`` with zero padding.

    out[..., i, ...] = src[..., x[i], ...] for fractional x, where each of the
    two integer taps contributes 0 if it lies outside [0, W-1] (zero-padding
    semantics matching grid_sample(padding_mode='zeros')).

    Args:
      src: source array.
      x: fractional coordinates, broadcastable to src's shape with ``axis``
        replaced by the output length.
      axis: the axis of ``src`` being sampled.

    Returns:
      Array with src's shape, ``axis`` replaced by x's length along it.
    """
    w = src.shape[axis]
    x0 = jnp.floor(x)
    frac = x - x0
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1

    def tap(xi, weight):
        valid = (xi >= 0) & (xi <= w - 1)
        g = jnp.take_along_axis(src, jnp.clip(xi, 0, w - 1), axis=axis)
        # weights cast to the SOURCE dtype: a bf16 source must produce a
        # bf16 gather (f32 weights would promote the [D,H,W,C] warp
        # intermediates to f32 and double their HBM traffic — the
        # dominant cost of DeepPruner's PatchMatch on TPU). Coordinates
        # stay in x's dtype (f32) for exact floor/frac up to W.
        return g * (weight * valid.astype(x.dtype)).astype(src.dtype)

    return tap(x0i, 1.0 - frac) + tap(x1i, frac)


def inverse_warp_2d(img, disp, compat_grid_sample=False):
    """Warp ``img`` (the source/right view) to the reference view.

    out[b, y, x, c] = img[b, y, x + disp[b, y, x], c]  (linear interp, zero
    outside the frame). For stereo, warping the right image to the left view
    uses ``disp = -left_disparity``.

    Parity target: dmb/modeling/stereo/layers/inverse_warp.py:4-42.

    Args:
      img: [B, H, W, C] source image/features.
      disp: [B, H, W, 1] or [B, H, W] horizontal offset added to x.
      compat_grid_sample: reproduce the reference's exact numerics (the 2-D
        analog of inverse_warp_3d's flag): align_corners=True-normalized
        coords fed to an align_corners=False grid_sample rescale every axis
        p -> p * n/(n-1) - 0.5 (blending adjacent rows on H), and samples
        whose pre-rescale x falls outside [0, W-1] are force-zeroed
        (inverse_warp.py:32-36 sets their normalized coords to 2). Off by
        default — the mathematically exact warp.

    Returns:
      [B, H, W, C] warped image.
    """
    if disp.ndim == 4:
        disp = disp[..., 0]
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=disp.dtype)[None, None, :] + disp  # [B, H, W]
    if compat_grid_sample:
        inframe = (xs >= 0) & (xs <= w - 1)
        ys = jnp.arange(h, dtype=disp.dtype) * (h / (h - 1)) - 0.5
        img = gather_1d_linear(img, ys[None, :, None, None], axis=1)
        xs = xs * (w / (w - 1)) - 0.5
        out = gather_1d_linear(img, xs[..., None], axis=2)
        return out * inframe[..., None].astype(out.dtype)
    return gather_1d_linear(img, xs[..., None], axis=2)


def inverse_warp_3d(fm, disp_sample, compat_grid_sample=False):
    """Per-sample warp of a feature map along width: the stereo 'gather'.

    out[b, d, y, x, c] = fm[b, y, x - disp_sample[b, d, y, x], c] with linear
    interpolation along W and zeros outside the frame. This is the semantics
    of the reference's trilinear grid_sample warp
    (dmb/modeling/stereo/layers/inverse_warp_3d.py:4-52) called with
    ``-disp_sample``; since the D and H grid coordinates are identity there,
    the trilinear sample reduces exactly to this 1-D linear gather.

    Args:
      fm: [B, H, W, C] feature map (the target/right view).
      disp_sample: [B, D, H, W] per-pixel disparity samples.
      compat_grid_sample: reproduce the reference's exact numerics — it
        normalizes coordinates with the align_corners=True formula but
        samples with F.grid_sample's default align_corners=False, which
        rescales the sample position to x * W/(W-1) - 0.5. Off by default
        (the mathematically exact warp); turn on for bit-faithful reuse of
        reference checkpoints in the warp-based models (AnyNet/DeepPruner).

    Returns:
      warped: [B, D, H, W, C]
      valid:  [B, D, H, W, 1] float mask, 1 where the warp landed fully
        inside the frame (both taps valid).
    """
    b, h, w, c = fm.shape
    d = disp_sample.shape[1]
    xs = jnp.arange(w, dtype=disp_sample.dtype)[None, None, None, :] - disp_sample
    if compat_grid_sample:
        # grid_sample(align_corners=False) on align_corners=True-normalized
        # coords rescales EVERY axis: p -> p * n/(n-1) - 0.5. Along W that
        # shifts the sample; along H it blends adjacent rows; along D (the
        # expanded axis, constant values) it attenuates the first/last
        # slices via the zero-padding taps.
        def _axis_pos(n, dtype):
            return (jnp.arange(n, dtype=dtype) * (n / (n - 1)) - 0.5)

        def _axis_border_scale(n, dtype):
            pos = _axis_pos(n, dtype)
            p0 = jnp.floor(pos)
            frac = pos - p0
            w0 = jnp.where((p0 >= 0) & (p0 <= n - 1), 1 - frac, 0.0)
            w1 = jnp.where((p0 + 1 >= 0) & (p0 + 1 <= n - 1), frac, 0.0)
            return w0 + w1

        ys = _axis_pos(h, disp_sample.dtype)
        fm = gather_1d_linear(fm, ys[None, :, None, None], axis=1)
        xs = xs * (w / (w - 1)) - 0.5
        src = fm[:, None]
        warped = gather_1d_linear(src, xs[..., None], axis=3)
        warped = warped * _axis_border_scale(d, warped.dtype)[
            None, :, None, None, None]
        valid = ((xs >= 0) & (xs <= w - 1)).astype(fm.dtype)[..., None]
        return warped, valid
    # [B, D, H, W] fractional source coords; gather from fm expanded over D.
    src = fm[:, None]  # [B, 1, H, W, C]
    warped = gather_1d_linear(src, xs[..., None], axis=3)
    valid = ((xs >= 0) & (xs <= w - 1)).astype(fm.dtype)[..., None]
    return warped, valid


def flow_warp(img, flow):
    """Warp ``img`` backward by a 2-D optical-flow field.

    out[b, y, x, c] = img[b, y + flow[b,y,x,1], x + flow[b,y,x,0], c] with
    bilinear interpolation and zero padding outside the frame (the flow
    analog of :func:`inverse_warp_2d`; the reference ships no flow models so
    there is no parity target — this extends dmb's flow scaffolding,
    dmb/modeling/flow/models/__init__.py:2-4).

    Bilinear interpolation is separable, so the warp is two chained 1-D
    linear gathers (W then H) — each lowers to a pair of
    ``take_along_axis`` dynamic-gathers on TPU, with exact piecewise-linear
    gradients.

    Args:
      img: [B, H, W, C] source image/features (frame t+1 for backward warp).
      flow: [B, H, W, 2] (u, v) displacement in pixels.

    Returns:
      [B, H, W, C] warped image.
    """
    b, h, w, c = img.shape
    u = flow[..., 0]
    v = flow[..., 1]
    xs = jnp.arange(w, dtype=flow.dtype)[None, None, :] + u   # [B, H, W]
    ys = jnp.arange(h, dtype=flow.dtype)[None, :, None] + v   # [B, H, W]
    out = gather_1d_linear(img, xs[..., None], axis=2)
    return gather_1d_linear(out, ys[..., None], axis=1)
