"""Static-shape linear interpolation (bilinear / trilinear resize).

The reference leans on F.interpolate(..., mode='bilinear'/'trilinear',
align_corners=True) for SPP branch upsampling (backbones/PSMNet.py:90-113)
and cost-volume upsampling (aggregators/PSMNet.py:78-92). jax.image.resize
implements half-pixel (align_corners=False) sampling, so we provide an exact
align_corners=True resize. Because shapes are static, the two taps and their
weights per output coordinate are numpy constants — each axis resize lowers
to two static gathers and a weighted add, which XLA fuses.
"""

import numpy as np
import jax.numpy as jnp


def _axis_taps(in_size, out_size, align_corners):
    """Static (idx0, idx1, w1) arrays for a 1-D linear resize."""
    if out_size == 1:
        x = np.zeros(1)
    elif align_corners:
        x = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        x = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        x = np.clip(x, 0, in_size - 1)
    idx0 = np.floor(x).astype(np.int64)
    idx0 = np.minimum(idx0, in_size - 2) if in_size > 1 else idx0
    w1 = (x - idx0).astype(np.float32)
    return idx0, np.minimum(idx0 + 1, in_size - 1), w1


def resize_linear(x, out_sizes, axes, align_corners=True):
    """Separable linear resize of ``x`` along ``axes`` to ``out_sizes``.

    Args:
      x: input array.
      out_sizes: target length per axis in ``axes``.
      axes: which axes to resize (each resized independently; separable
        linear interpolation == bilinear/trilinear for 2/3 axes).
      align_corners: corner-aligned (True, the reference's choice) or
        half-pixel-centered sampling.
    """
    for axis, out_size in zip(axes, out_sizes):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        idx0, idx1, w1 = _axis_taps(in_size, out_size, align_corners)
        g0 = jnp.take(x, jnp.asarray(idx0), axis=axis)
        g1 = jnp.take(x, jnp.asarray(idx1), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        w1 = jnp.asarray(w1, dtype=x.dtype).reshape(shape)
        x = g0 * (1 - w1) + g1 * w1
    return x


def upsample_2d(x, out_h, out_w, align_corners=True):
    """[B, H, W, C] -> [B, out_h, out_w, C] bilinear."""
    return resize_linear(x, (out_h, out_w), (1, 2), align_corners)


def upsample_3d(x, out_d, out_h, out_w, align_corners=True):
    """[B, D, H, W(, C)] -> [B, out_d, out_h, out_w(, C)] trilinear."""
    return resize_linear(x, (out_d, out_h, out_w), (1, 2, 3), align_corners)
