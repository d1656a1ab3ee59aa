"""PSMNet cost aggregation: 3 stacked 3-D hourglasses + classify heads.

Parity target: dmb/modeling/stereo/cost_processors/aggregators/PSMNet.py:9-95.
Input raw cost volume [B, D/4, H/4, W/4, 2C]; outputs 3 full-resolution cost
volumes [B, max_disp, H, W], best (deepest) first.

This is where PSMNet's FLOPs live (the reference measures 938 GFLOPs at
384x1248); channels-last NDHWC keeps every 3-D conv on the MXU.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv3d_bn, conv3d_bn_relu, Hourglass3D
from ...ops.interpolate import upsample_3d


class PSMAggregator(nn.Module):
    max_disp: int = 192
    batch_norm: bool = True
    dtype: Any = jnp.float32
    # When True, skip the trilinear upsample and return the three low-res
    # classified costs [B, D/4, H/4, W/4] — the meta-architecture then
    # fuses upsample+soft-argmin in a Pallas kernel (eval) or upsamples
    # with XLA (train).
    return_low_res: bool = False

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        b, d, h, w, c = raw_cost.shape

        cost0 = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            raw_cost, train)
        cost0 = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            cost0, train)
        dres1 = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            cost0, train)
        dres1 = conv3d_bn(bn, 32, 3, 1, 1, bias=False, dtype=dt)(dres1, train)
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
            x = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(x, train)
            return nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=dt,
                           param_dtype=jnp.float32)(x)

        cost1 = classify(out1)
        cost2 = classify(out2) + cost1
        cost3 = classify(out3) + cost2

        if self.return_low_res:
            return [cost3[..., 0], cost2[..., 0], cost1[..., 0]]

        full_h, full_w = h * 4, w * 4

        def to_full(cost):
            # [B, D, H, W, 1] -> trilinear upsample -> [B, max_disp, 4H, 4W]
            # stays in compute dtype (bf16 on TPU): halves the HBM traffic
            # of the full-res volume; consumers (soft-argmin softmax, focal
            # log-softmax) upcast to f32 internally.
            return upsample_3d(cost[..., 0], self.max_disp, full_h, full_w,
                               align_corners=True)

        return [to_full(cost3), to_full(cost2), to_full(cost1)]
