"""AnyNet backbone: tiny U-Net producing 1/16, 1/8, 1/4 feature pyramids.

Parity target: dmb/modeling/stereo/backbones/AnyNet.py:8-108.
Output per view: [[B, H/16, W/16, 8C], [B, H/8, W/8, 4C], [B, H/4, W/4, 2C]]
(C = 1 by default — AnyNet totals 47K params).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import bn_relu_conv
from ...ops.interpolate import upsample_2d


class AnyNetBackbone(nn.Module):
    in_planes: int = 3
    C: int = 1
    block_num: int = 2
    batch_norm: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        bn, dt, c = self.batch_norm, self.dtype, self.C
        self.conv_init = nn.Conv(c, (3, 3), padding=1, use_bias=False,
                                 dtype=dt, param_dtype=jnp.float32)
        self.conv_down2 = bn_relu_conv(bn, c, 3, 2, 1, bias=False, dtype=dt)

        def down_blocks(out_planes):
            return [bn_relu_conv(bn, out_planes, 3, 1, 1, bias=False,
                                 dtype=dt) for _ in range(self.block_num)]

        self.down_4x = down_blocks(2 * c)   # after maxpool: 1/4
        self.down_8x = down_blocks(4 * c)   # after maxpool: 1/8
        self.down_16x = down_blocks(8 * c)  # after maxpool: 1/16

        def up_blocks(out_planes):
            return [bn_relu_conv(bn, out_planes, 3, 1, 1, bias=False,
                                 dtype=dt) for _ in range(2)]

        self.mix_8x = up_blocks(4 * c)
        self.mix_4x = up_blocks(2 * c)

    def _forward(self, x, train):
        x = self.conv_down2(self.conv_init(x.astype(self.dtype)), train)

        def run(blocks, h):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for blk in blocks:
                h = blk(h, train)
            return h

        out_4 = run(self.down_4x, x)
        out_8 = run(self.down_8x, out_4)
        out_16 = run(self.down_16x, out_8)

        up16 = upsample_2d(out_16, out_8.shape[1], out_8.shape[2],
                           align_corners=False)
        mix8 = jnp.concatenate([out_8, up16], axis=-1)
        for blk in self.mix_8x:
            mix8 = blk(mix8, train)

        up8 = upsample_2d(mix8, out_4.shape[1], out_4.shape[2],
                          align_corners=False)
        mix4 = jnp.concatenate([out_4, up8], axis=-1)
        for blk in self.mix_4x:
            mix4 = blk(mix4, train)

        return [out_16, mix8, mix4]

    def __call__(self, left, right, train: bool = False):
        return self._forward(left, train), self._forward(right, train)
