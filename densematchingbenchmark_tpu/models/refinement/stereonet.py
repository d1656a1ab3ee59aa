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
    # pack > 1: run the full-resolution 13-conv trunk (mix conv + 6 dilated
    # BasicBlocks) in the row-packed layout [B, H/pack, W, pack*C]
    # (ops/conv3d.conv2d_rowpacked) — the 2-D analog of the 3-D
    # trunk-packed MXU schedule; same params either way. Requires H % pack
    # == 0 (auto-falls back unpacked otherwise).
    pack: int = 0

    @nn.compact
    def __call__(self, disp, left_image, train: bool = False):
        from ...ops.conv3d import pack_rows2d, unpack_rows2d
        h, w = left_image.shape[1:3]
        scale = w / disp.shape[2]
        if scale != 1.0:
            disp = upsample_2d(disp, h, w, align_corners=False) * scale
        mix = jnp.concatenate([disp.astype(self.dtype),
                               left_image.astype(self.dtype)], axis=-1)
        pk = self.pack if self.pack and self.pack > 1 else 1
        if h % pk:
            pk = 1
        if pk > 1:
            mix = pack_rows2d(mix, pk)
        mix = conv_bn_relu(self.batch_norm, 32, 3, 1, 1, bias=True,
                           dtype=self.dtype, pack=pk)(mix, train)
        for dilation in (1, 2, 4, 8, 1, 1):
            mix = BasicBlock(32, 1, 1, dilation, self.batch_norm,
                             dtype=self.dtype, pack=pk)(mix, train)
        if pk > 1:
            mix = unpack_rows2d(mix, pk)
        res = nn.Conv(1, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32)(mix)
        return nn.relu(res.astype(jnp.float32) + disp)


class StereoNetRefinement(nn.Module):
    num: int = 1
    batch_norm: bool = True
    dtype: Any = jnp.float32
    pack: int = 0  # see EdgeAwareRefinement.pack

    @nn.compact
    def __call__(self, disps, ref_fms, tgt_fms, left_image, right_image,
                 train: bool = False):
        init_disp = disps[-1]
        h, w = left_image.shape[1:3]
        scale = w / init_disp.shape[2]
        init_disp = upsample_2d(init_disp, h, w, align_corners=False) * scale
        out = [init_disp]
        for _ in range(self.num):
            out.append(EdgeAwareRefinement(self.batch_norm, self.dtype,
                                           pack=self.pack)(
                out[-1], left_image, train))
        return out[::-1]  # best first
