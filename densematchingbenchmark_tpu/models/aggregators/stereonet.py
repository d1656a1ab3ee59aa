"""StereoNet aggregator: 4 conv3d_bn_relu + final conv3d, low-res cost.

Parity target: dmb/modeling/stereo/cost_processors/aggregators/
StereoNet.py:9-55. The cost stays at feature resolution (1/8 or 1/16);
upsampling to full resolution happens in the refinement module.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv3d_bn_relu


class StereoNetAggregator(nn.Module):
    max_disp: int = 192
    num: int = 4
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        x = raw_cost
        for _ in range(self.num):
            x = conv3d_bn_relu(self.batch_norm, 32, 3, 1, 1, bias=True,
                               dtype=self.dtype)(x, train)
        x = nn.Conv(1, (3, 3, 3), padding=1, use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        return [x[..., 0].astype(jnp.float32)]
