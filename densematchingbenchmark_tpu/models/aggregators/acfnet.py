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

from ..layers import (ConvUnit, DispatchConv3D, Hourglass3D,
                      ConvTransposeExact)
from ...ops.conv3d import pack_volume, unpack_volume


class AcfAggregator(nn.Module):
    max_disp: int = 192
    batch_norm: bool = True
    dtype: Any = jnp.float32
    # Trunk-packed MXU schedule, same as PSMAggregator.pack (ops/conv3d.py):
    # pack the raw volume once, run every trunk conv 128-lane, unpack the
    # three 1-channel costs before the learned deconv upsampling.
    pack: int = 0
    # Per-hourglass rematerialization; see PSMAggregator.remat.
    remat: bool = False
    # D-sharded cost-volume support; see PSMAggregator.strided_sharding.
    strided_sharding: Any = None
    volume_sharding: Any = None

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        b, d, h, w, c = raw_cost.shape
        pk = self.pack if self.pack and self.pack > 1 else 1
        if pk > 1 and (d % (4 * pk) != 0 or h % 4 or w % 4):
            pk = 1  # safe fallback: same params, unpacked schedule
        if pk > 1:
            raw_cost = pack_volume(raw_cost, pk)

        def unit(features, relu=True):
            return ConvUnit(features, 3, 1, 1, dims=3, batch_norm=bn,
                            relu=relu, dtype=dt, pack=pk)

        cost0 = unit(32)(raw_cost, train)
        cost0 = unit(32)(cost0, train)
        dres1 = unit(32)(cost0, train)
        dres1 = unit(32, relu=False)(dres1, train)
        cost0 = dres1 + cost0

        hg_cls = (nn.remat(Hourglass3D, static_argnums=(4,))
                  if self.remat else Hourglass3D)

        def hourglass(i):
            return hg_cls(32, bn, dtype=dt, pack=pk,
                          strided_sharding=self.strided_sharding,
                          name=f"Hourglass3D_{i}")

        def gather_d(x):
            if self.strided_sharding is not None:
                import jax
                return jax.lax.with_sharding_constraint(
                    x, self.strided_sharding)
            return x

        out1, pre1, post1 = hourglass(0)(gather_d(cost0), None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = hourglass(1)(gather_d(out1), pre1, post1, train)
        out2 = out2 + cost0
        out3, _, _ = hourglass(2)(gather_d(out2), pre2, post2, train)
        out3 = out3 + cost0

        def classify(x, i):
            if self.volume_sharding is not None:
                import jax
                x = jax.lax.with_sharding_constraint(x, self.volume_sharding)
            x = unit(32)(x, train)
            if pk > 1:
                return DispatchConv3D(
                    1, (3, 3, 3), padding=(1, 1, 1), use_bias=False,
                    dtype=dt, pack=pk, name=f"Conv_{i}")(x)
            return nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=dt,
                           param_dtype=jnp.float32, name=f"Conv_{i}")(x)

        cost1 = classify(out1, 0)
        cost2 = classify(out2, 1) + cost1
        cost3 = classify(out3, 2) + cost2
        if pk > 1:
            cost1, cost2, cost3 = (unpack_volume(x, pk)
                                   for x in (cost1, cost2, cost3))

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
