"""StereoNet edge-aware disparity refinement.

Parity targets:
  dmb/modeling/stereo/disp_refinement/StereoNet.py:7-61
  dmb/modeling/stereo/disp_refinement/utils/edge_aware.py:8-69

Upsamples the coarse disparity to full resolution (scaling values by the
width ratio), then cascades ``num`` edge-aware blocks: each mixes
[disp ‖ left image] through a conv + 6 dilated residual blocks (dilations
1,2,4,8,1,1) into a residual, ReLU-clamped. Returns the refined list
best-first. Upsampling uses align_corners=False (the reference's
F.interpolate default here — unlike its SPP/aggregator upsampling).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv_bn_relu, BasicBlock
from ...ops.interpolate import upsample_2d


class EdgeAwareRefinement(nn.Module):
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, left_image, train: bool = False):
        h, w = left_image.shape[1:3]
        scale = w / disp.shape[2]
        if scale != 1.0:
            disp = upsample_2d(disp, h, w, align_corners=False) * scale
        mix = jnp.concatenate([disp.astype(self.dtype),
                               left_image.astype(self.dtype)], axis=-1)
        mix = conv_bn_relu(self.batch_norm, 32, 3, 1, 1, bias=True,
                           dtype=self.dtype)(mix, train)
        for dilation in (1, 2, 4, 8, 1, 1):
            mix = BasicBlock(32, 1, 1, dilation, self.batch_norm,
                             dtype=self.dtype)(mix, train)
        res = nn.Conv(1, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32)(mix)
        return nn.relu(res.astype(jnp.float32) + disp)


class StereoNetRefinement(nn.Module):
    num: int = 1
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disps, ref_fms, tgt_fms, left_image, right_image,
                 train: bool = False):
        init_disp = disps[-1]
        h, w = left_image.shape[1:3]
        scale = w / init_disp.shape[2]
        init_disp = upsample_2d(init_disp, h, w, align_corners=False) * scale
        out = [init_disp]
        for _ in range(self.num):
            out.append(EdgeAwareRefinement(self.batch_norm, self.dtype)(
                out[-1], left_image, train))
        return out[::-1]  # best first
