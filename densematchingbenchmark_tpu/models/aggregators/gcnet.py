"""GCNet 3-D encoder-decoder aggregator (layers 19-37).

Parity target: dmb/modeling/stereo/cost_processors/aggregators/GCNet.py:7-120.
Input: concat volume [B, max_disp/2, H/2, W/2, 2C] (C = 32); 4 stride-2
down stages with dense skip concats, 5 transposed-conv up stages with
additive skips; full-resolution single cost volume output.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv3d_bn_relu, deconv3d_bn_relu, ConvTransposeExact


class GCAggregator(nn.Module):
    max_disp: int = 192
    in_planes: int = 64  # channels of the raw concat volume
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        f = self.in_planes // 2

        def conv(features, stride=1):
            return conv3d_bn_relu(bn, features, 3, stride, 1, bias=False,
                                  dtype=dt)

        def deconv(features):
            return deconv3d_bn_relu(bn, features, 3, 2, 1, output_padding=1,
                                    bias=False, dtype=dt)

        c18 = raw_cost
        c19 = conv(f)(c18, train)
        c20 = conv(f)(c19, train)
        c21 = conv(f * 2, 2)(jnp.concatenate([c18, c20], -1), train)  # 1/4
        c22 = conv(f * 2)(c21, train)
        c23 = conv(f * 2)(c22, train)
        c24 = conv(f * 2, 2)(jnp.concatenate([c21, c23], -1), train)  # 1/8
        c25 = conv(f * 2)(c24, train)
        c26 = conv(f * 2)(c25, train)
        c27 = conv(f * 2, 2)(jnp.concatenate([c24, c26], -1), train)  # 1/16
        c28 = conv(f * 2)(c27, train)
        c29 = conv(f * 2)(c28, train)
        c30 = conv(f * 4, 2)(jnp.concatenate([c27, c29], -1), train)  # 1/32
        c31 = conv(f * 4)(c30, train)
        c32 = conv(f * 4)(c31, train)

        c33 = deconv(f * 2)(c32, train)
        c34 = deconv(f * 2)(c33 + c29, train)
        c35 = deconv(f * 2)(c34 + c26, train)
        c36 = deconv(f)(c35 + c23, train)
        c37 = ConvTransposeExact(1, 3, 2, 1, output_padding=1, dims=3,
                                 dtype=dt)(c36 + c20)
        # stays in compute dtype: the full-res volume is HBM-bound and the
        # soft-argmin upcasts to f32 internally
        return [c37[..., 0]]
