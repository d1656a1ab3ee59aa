"""Core stereo numerics: warps, cost volumes, disparity regression, priors."""

from .warp import inverse_warp_2d, inverse_warp_3d, gather_1d_linear
from .cost_volume import (cat_volume, dif_volume, correlation1d_volume,
                          disp_sample_values)
from .soft_argmin import soft_argmin, local_soft_argmin
from .disp2prob import laplace_prob, gaussian_prob, onehot_prob
from .interpolate import resize_linear, upsample_2d, upsample_3d
from .pooling import adaptive_avg_pool2d, adaptive_max_pool2d, avg_pool2d

__all__ = [
    "inverse_warp_2d", "inverse_warp_3d", "gather_1d_linear",
    "cat_volume", "dif_volume", "correlation1d_volume", "disp_sample_values",
    "soft_argmin", "local_soft_argmin",
    "laplace_prob", "gaussian_prob", "onehot_prob",
    "resize_linear", "upsample_2d", "upsample_3d",
    "adaptive_avg_pool2d", "adaptive_max_pool2d", "avg_pool2d",
]
