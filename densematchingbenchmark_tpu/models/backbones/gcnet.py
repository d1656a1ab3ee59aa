"""GCNet feature backbone: 5x5 stride-2 conv + 8 residual blocks + 3x3 conv.

Parity target: dmb/modeling/stereo/backbones/GCNet.py:8-47.
Output: [B, H/2, W/2, 32] per view (siamese).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv_bn_relu, BasicBlock


class GCNetBackbone(nn.Module):
    in_planes: int = 3
    batch_norm: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        bn, dt = self.batch_norm, self.dtype
        self.stem = conv_bn_relu(bn, 32, 5, 2, 2, dtype=dt)
        self.blocks = [BasicBlock(32, 1, 1, 1, bn, dtype=dt)
                       for _ in range(8)]
        self.final = nn.Conv(32, (3, 3), padding=1, dtype=dt,
                             param_dtype=jnp.float32)

    def _forward(self, x, train):
        x = self.stem(x, train)
        for blk in self.blocks:
            x = blk(x, train)
        return self.final(x)

    def __call__(self, left, right, train: bool = False):
        return self._forward(left, train), self._forward(right, train)
