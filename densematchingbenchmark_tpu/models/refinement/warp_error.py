"""Warp-error disparity refinement (inventory utility).

Parity target: dmb/modeling/stereo/disp_refinement/utils/min_warp_error.py
(WarpErrorRefinement; unused by shipped reference configs): upsample the
disparity, warp the right features, and refine from the photometric error
[left ‖ right ‖ warped ‖ |error| ‖ disp] through dilated conv blocks.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv_bn_relu
from ...ops.warp import inverse_warp_2d
from ...ops.interpolate import upsample_2d


class WarpErrorRefinement(nn.Module):
    C: int = 16
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, left, right, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        h, w = left.shape[1:3]
        scale = w / disp.shape[2]
        up_disp = upsample_2d(disp, h, w, align_corners=True) * scale

        warped = inverse_warp_2d(right, -up_disp)
        error = jnp.abs(left - warped)
        mix = jnp.concatenate([left, right, warped, error, up_disp],
                              axis=-1).astype(dt)
        mix = conv_bn_relu(bn, 2 * self.C, 3, 1, 1, bias=False,
                           dtype=dt)(mix, train)
        for dil in (1, 2, 4, 8, 1, 1):
            mix = conv_bn_relu(bn, 2 * self.C, 3, 1, dil, dil, bias=False,
                               dtype=dt)(mix, train)
        res = nn.Conv(1, (3, 3), padding=1, use_bias=True, dtype=dt,
                      param_dtype=jnp.float32)(mix)
        return nn.relu(res.astype(jnp.float32) + up_disp)
