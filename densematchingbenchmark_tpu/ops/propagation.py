"""Affinity propagation (CSPN) and bilateral filtering utilities.

Parity targets:
  dmb/modeling/stereo/layers/cspn.py:37-185 (AffinityPropagate 2D/3D)
  dmb/modeling/stereo/layers/bilateral_filter.py:8-98

Both are shift-and-accumulate stencils: instead of the reference's pad/slice
loops over torch tensors, these are pad/slice loops over jnp arrays that XLA
fuses into a single stencil kernel. Inventory items (not used by shipped
reference configs) kept as ops for refinement experiments.
"""

import jax.numpy as jnp


def affinity_propagate_2d(affinity, feature, iterations=1, kernel_size=3,
                          dilation=1):
    """CSPN: feature[i] <- sum_k norm|affinity_k|[i] * feature[i + offset_k].

    Args:
      affinity: [B, H, W, K*K] per-pixel affinity for each neighbor.
      feature: [B, H, W, C].
    """
    k, d = kernel_size, dilation
    b, h, w, c = feature.shape
    assert affinity.shape[-1] == k * k
    aff = jnp.abs(affinity)
    aff = aff / jnp.sum(aff, axis=-1, keepdims=True)

    pad = (k - 1) // 2 * d
    for _ in range(iterations):
        fp = jnp.pad(feature, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = jnp.zeros_like(feature)
        idx = 0
        for ky in range(k):
            for kx in range(k):
                sy, sx = ky * d, kx * d
                out = out + fp[:, sy:sy + h, sx:sx + w] * \
                    aff[..., idx:idx + 1]
                idx += 1
        feature = out
    return feature


def affinity_propagate_3d(affinity, volume, iterations=1, kernel_size=3,
                          dilation=1):
    """CSPN-3D over a cost volume [B, D, H, W, C]; affinity [B, D, H, W, K^3]."""
    k, dil = kernel_size, dilation
    b, d, h, w, c = volume.shape
    assert affinity.shape[-1] == k ** 3
    aff = jnp.abs(affinity)
    aff = aff / jnp.sum(aff, axis=-1, keepdims=True)

    pad = (k - 1) // 2 * dil
    for _ in range(iterations):
        vp = jnp.pad(volume, ((0, 0), (pad, pad), (pad, pad), (pad, pad),
                              (0, 0)))
        out = jnp.zeros_like(volume)
        idx = 0
        for kd in range(k):
            for ky in range(k):
                for kx in range(k):
                    sd, sy, sx = kd * dil, ky * dil, kx * dil
                    out = out + vp[:, sd:sd + d, sy:sy + h, sx:sx + w] * \
                        aff[..., idx:idx + 1]
                    idx += 1
        volume = out
    return volume


def bilateral_filter(disp, image, kernel_size=5, sigma_space=1.5,
                     sigma_color=10.0):
    """Edge-preserving disparity smoothing guided by the image.

    Parity: layers/bilateral_filter.py:8-98 (fixed-kernel bilateral filter).

    Args:
      disp: [B, H, W, 1]; image: [B, H, W, C] guidance.
    """
    k = kernel_size
    p = k // 2
    b, h, w, _ = disp.shape
    dp = jnp.pad(disp, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    ip = jnp.pad(image, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")

    num = jnp.zeros_like(disp)
    den = jnp.zeros_like(disp)
    for dy in range(k):
        for dx in range(k):
            spatial = jnp.exp(-((dy - p) ** 2 + (dx - p) ** 2) /
                              (2 * sigma_space ** 2))
            diff = ip[:, dy:dy + h, dx:dx + w] - image
            color = jnp.exp(-jnp.sum(diff * diff, -1, keepdims=True) /
                            (2 * sigma_color ** 2))
            wgt = spatial * color
            num = num + wgt * dp[:, dy:dy + h, dx:dx + w]
            den = den + wgt
    return num / (den + 1e-8)
