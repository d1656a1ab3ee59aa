"""Pooling helpers used to rescale GT disparity to a loss level.

The reference uses F.adaptive_avg_pool2d (dense GT) / F.adaptive_max_pool2d
(sparse GT, e.g. KITTI) to shrink the GT map to each prediction level
(smooth_l1_loss.py:28-43). In this framework every level's scale factor is an
exact integer (static shapes), so adaptive pooling reduces to a reshape
reduction — a free fusion for XLA, no windowed gather needed.
"""

import jax.numpy as jnp


def _reshape_pool(x, out_h, out_w, reducer):
    """Pool [B, H, W, C] -> [B, out_h, out_w, C] via exact block reduction."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    assert h % out_h == 0 and w % out_w == 0, (
        f"adaptive pool needs integer ratio, got {h}x{w} -> {out_h}x{out_w}")
    kh, kw = h // out_h, w // out_w
    x = x.reshape(b, out_h, kh, out_w, kw, c)
    return reducer(x, axis=(2, 4))


def adaptive_avg_pool2d(x, out_h, out_w):
    """Exact-block average pool (dense GT rescale)."""
    return _reshape_pool(x, out_h, out_w, jnp.mean)


def adaptive_max_pool2d(x, out_h, out_w):
    """Exact-block max pool (sparse GT rescale: keeps valid pixels alive)."""
    return _reshape_pool(x, out_h, out_w, jnp.max)


def avg_pool2d(x, window, stride=None):
    """Plain average pooling with window == stride (SPP branches).

    Parity with nn.AvgPool2d((k, k), stride=(k, k)) as used by the PSMNet SPP
    module (backbones/PSMNet.py:42-58): floor division of the spatial dims.
    """
    if stride is None:
        stride = window
    b, h, w, c = x.shape
    out_h, out_w = h // stride, w // stride
    x = x[:, :out_h * stride, :out_w * stride, :]
    if window == stride:
        return adaptive_avg_pool2d(x, out_h, out_w)
    raise NotImplementedError("only window == stride pooling is used")
