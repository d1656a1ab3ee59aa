"""AcfNet cost aggregation: PSMNet trunk with learned deconv upsampling.

Parity target: dmb/modeling/stereo/cost_processors/aggregators/AcfNet.py:8-91.
Same stacked-hourglass trunk as PSMAggregator (with bias=True convs here —
the reference omits bias=False for AcfNet) but upsamples the three
classified costs with learned ConvTranspose3d(1->1, k=8, s=4, p=2) instead
of trilinear interpolation.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv3d_bn, conv3d_bn_relu, Hourglass3D, ConvTransposeExact


class AcfAggregator(nn.Module):
    max_disp: int = 192
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        bn, dt = self.batch_norm, self.dtype

        cost0 = conv3d_bn_relu(bn, 32, 3, 1, 1, dtype=dt)(raw_cost, train)
        cost0 = conv3d_bn_relu(bn, 32, 3, 1, 1, dtype=dt)(cost0, train)
        dres1 = conv3d_bn_relu(bn, 32, 3, 1, 1, dtype=dt)(cost0, train)
        dres1 = conv3d_bn(bn, 32, 3, 1, 1, dtype=dt)(dres1, train)
        cost0 = dres1 + cost0

        out1, pre1, post1 = Hourglass3D(32, bn, dtype=dt)(
            cost0, None, None, train=train)
        out1 = out1 + cost0
        out2, pre2, post2 = Hourglass3D(32, bn, dtype=dt)(
            out1, pre1, post1, train=train)
        out2 = out2 + cost0
        out3, _, _ = Hourglass3D(32, bn, dtype=dt)(
            out2, pre2, post2, train=train)
        out3 = out3 + cost0

        def classify(x):
            x = conv3d_bn_relu(bn, 32, 3, 1, 1, dtype=dt)(x, train)
            return nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=dt,
                           param_dtype=jnp.float32)(x)

        cost1 = classify(out1)
        cost2 = classify(out2) + cost1
        cost3 = classify(out3) + cost2

        def up(x):
            # ConvTranspose3d(1, 1, 8, 4, 2): out = (in-1)*4 - 4 + 8 = 4*in
            x = ConvTransposeExact(1, kernel_size=8, stride=4, padding=2,
                                   output_padding=0, dims=3, use_bias=False,
                                   dtype=dt)(x)
            return x[..., 0]  # compute dtype; consumers upcast

        # deconv_i belongs to cost_i — create in 1, 2, 3 order so the
        # weight converter's order-based pairing matches the reference's
        # deconv1..3 definition order (aggregators/AcfNet.py:56-58)
        up1, up2, up3 = up(cost1), up(cost2), up(cost3)
        return [up3, up2, up1]
