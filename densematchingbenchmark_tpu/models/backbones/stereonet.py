"""StereoNet backbone: K 5x5 stride-2 downsample convs + 6 residual blocks.

Parity target: dmb/modeling/stereo/backbones/StereoNet.py:34-99.
Output: [B, H/2^K, W/2^K, 32] per view (K = downsample_num, default 3).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import BasicBlock


class StereoNetBackbone(nn.Module):
    in_planes: int = 3
    batch_norm: bool = True
    downsample_num: int = 3
    residual_num: int = 6
    dtype: Any = jnp.float32

    def setup(self):
        self.downsample = [
            nn.Conv(32, (5, 5), strides=2, padding=2, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32)
            for _ in range(self.downsample_num)]
        self.blocks = [BasicBlock(32, 1, 1, 1, self.batch_norm,
                                  dtype=self.dtype)
                       for _ in range(self.residual_num)]
        self.final = nn.Conv(32, (3, 3), padding=1, use_bias=True,
                             dtype=self.dtype, param_dtype=jnp.float32)

    def _forward(self, x, train):
        x = x.astype(self.dtype)
        for down in self.downsample:
            x = down(x)
        for blk in self.blocks:
            x = blk(x, train)
        return self.final(x)

    def __call__(self, left, right, train: bool = False):
        return self._forward(left, train), self._forward(right, train)
