"""AnyNet aggregator: small bn_relu_conv3d stack -> single-channel cost.

Parity target: dmb/modeling/stereo/cost_processors/aggregators/AnyNet.py:7-45.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import bn_relu_conv3d


class AnyNetAggregator(nn.Module):
    agg_planes: int = 4
    num: int = 4
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        x = raw_cost
        x = bn_relu_conv3d(self.batch_norm, self.agg_planes, 3, 1, 1,
                           bias=True, dtype=self.dtype)(x, train)
        for _ in range(self.num):
            x = bn_relu_conv3d(self.batch_norm, self.agg_planes, 3, 1, 1,
                               bias=True, dtype=self.dtype)(x, train)
        x = bn_relu_conv3d(self.batch_norm, 1, 3, 1, 1, bias=True,
                           dtype=self.dtype)(x, train)
        return [x[..., 0].astype(jnp.float32)]
