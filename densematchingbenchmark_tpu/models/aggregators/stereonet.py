"""StereoNet aggregator: 4 conv3d_bn_relu + final conv3d, low-res cost.

Parity target: dmb/modeling/stereo/cost_processors/aggregators/
StereoNet.py:9-55. The cost stays at feature resolution (1/8 or 1/16);
upsampling to full resolution happens in the refinement module.

pack > 1 runs the (stride-1-only) trunk in the D-packed layout
(ops/conv3d.py): D/8 = 24 rows pack 4 -> 6 packed rows at 128-lane convs.
Same params as unpacked (pure schedule change, like PSMAggregator.pack).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import ConvUnit, DispatchConv3D
from ...ops.conv3d import pack_volume, unpack_volume


class StereoNetAggregator(nn.Module):
    max_disp: int = 192
    num: int = 4
    batch_norm: bool = True
    dtype: Any = jnp.float32
    pack: int = 0

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        b, d, h, w, c = raw_cost.shape
        pk = self.pack if self.pack and self.pack > 1 else 1
        if pk > 1 and d % pk != 0:
            pk = 1  # safe fallback: same params, unpacked schedule
        x = pack_volume(raw_cost, pk) if pk > 1 else raw_cost
        for _ in range(self.num):
            # ConvUnit(pack=pk) == reference conv3d_bn_relu; params and
            # module paths identical across pack settings
            x = ConvUnit(32, 3, 1, 1, dims=3, batch_norm=self.batch_norm,
                         relu=True, bias=True, dtype=self.dtype,
                         pack=pk)(x, train)
        if pk > 1:
            x = DispatchConv3D(1, (3, 3, 3), padding=(1, 1, 1),
                               use_bias=True, dtype=self.dtype, pack=pk,
                               name="Conv_0")(x)
            x = unpack_volume(x, pk)
        else:
            x = nn.Conv(1, (3, 3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="Conv_0")(x)
        return [x[..., 0].astype(jnp.float32)]
