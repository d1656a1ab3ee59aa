"""PSMNet feature backbone: firstconv + residual layers + SPP fusion.

Parity target: dmb/modeling/stereo/backbones/PSMNet.py:8-129.
Siamese: the same module (same params) is applied to left and right images;
in Flax this is just calling the module twice — parameter sharing is free.

Output: [B, H/4, W/4, 32] per view.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv_bn_relu, conv_bn, BasicBlock
from ...ops.pooling import avg_pool2d
from ...ops.interpolate import upsample_2d


class PSMNetBackbone(nn.Module):
    in_planes: int = 3
    batch_norm: bool = True
    dtype: Any = jnp.float32
    # pack > 1: run the lane-starved 32-channel half-resolution section
    # (firstconv[1:] + layer1) in the row-packed layout
    # (ops/conv3d.conv2d_rowpacked). Requires H/2 % pack == 0 (all shipped
    # train/eval shapes satisfy it); same params as unpacked.
    pack: int = 0

    def setup(self):
        bn, dt = self.batch_norm, self.dtype
        pk = self.pack if self.pack and self.pack > 1 else 1
        self.firstconv = [conv_bn_relu(bn, 32, 3, 2, 1, 1, bias=False, dtype=dt),
                          conv_bn_relu(bn, 32, 3, 1, 1, 1, bias=False,
                                       dtype=dt, pack=pk),
                          conv_bn_relu(bn, 32, 3, 1, 1, 1, bias=False,
                                       dtype=dt, pack=pk)]

        def layer(out_planes, blocks, stride, padding, dilation, in_planes,
                  pack=1):
            mods = [BasicBlock(out_planes, stride, padding, dilation, bn,
                               downsample=(stride != 1 or
                                           in_planes != out_planes),
                               dtype=dt, pack=pack)]
            mods += [BasicBlock(out_planes, 1, padding, dilation, bn,
                                dtype=dt, pack=pack)
                     for _ in range(blocks - 1)]
            return mods

        self.layer1 = layer(32, 3, 1, 1, 1, 32, pack=pk)
        self.layer2 = layer(64, 16, 2, 1, 1, 32)
        self.layer3 = layer(128, 3, 1, 1, 1, 64)
        self.layer4 = layer(128, 3, 1, 2, 2, 128)

        # SPP branches: avg-pool k, 1x1 conv to 32, bilinear back up
        self.branch_convs = [conv_bn_relu(bn, 32, 1, 1, 0, 1, bias=False,
                                          dtype=dt) for _ in range(4)]
        self.branch_pools = (64, 32, 16, 8)

        self.lastconv1 = conv_bn_relu(bn, 128, 3, 1, 1, 1, bias=False, dtype=dt)
        self.lastconv2 = nn.Conv(32, (1, 1), use_bias=False, dtype=dt,
                                 param_dtype=jnp.float32)

    def _forward(self, x, train):
        from ...ops.conv3d import pack_rows2d, unpack_rows2d
        pk = self.pack if self.pack and self.pack > 1 else 1
        x = self.firstconv[0](x, train)          # 1/2
        if pk > 1:
            assert x.shape[1] % pk == 0, (x.shape, pk)
            x = pack_rows2d(x, pk)
        for m in self.firstconv[1:]:
            x = m(x, train)
        for m in self.layer1:
            x = m(x, train)
        if pk > 1:
            x = unpack_rows2d(x, pk)
        out_4_0 = x
        for m in self.layer2:
            out_4_0 = m(out_4_0, train)          # 1/4
        out_4_1 = out_4_0
        for m in self.layer3:
            out_4_1 = m(out_4_1, train)
        out_8 = out_4_1
        for m in self.layer4:
            out_8 = m(out_8, train)              # still 1/4 (dilated)

        h, w = out_8.shape[1], out_8.shape[2]
        branches = []
        for k, conv in zip(self.branch_pools, self.branch_convs):
            # clamp the pool window for inputs smaller than the SPP scale
            # (the reference crashes there; real configs never hit it)
            b = avg_pool2d(out_8, min(k, h, w))
            b = conv(b, train)
            branches.append(upsample_2d(b, h, w, align_corners=True))
        # concat order mirrors the reference: skip, trunk, branches 4..1
        feat = jnp.concatenate(
            [out_4_0, out_8, branches[3], branches[2], branches[1],
             branches[0]], axis=-1)
        feat = self.lastconv1(feat, train)
        return self.lastconv2(feat)

    def __call__(self, left, right, train: bool = False):
        return self._forward(left, train), self._forward(right, train)
