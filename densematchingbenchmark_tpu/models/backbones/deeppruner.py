"""DeepPruner backbones (Best = scale 4, Fast = scale 8).

Parity target: dmb/modeling/stereo/backbones/DeepPruner.py:8-252.
PSMNet-style SPP trunk; returns (feature, [low-res guide features...]):
  Best: [B, H/4, W/4, 32], guides [[B, H/2, W/2, 32]]
  Fast: [B, H/8, W/8, 32], guides [[B, H/4, W/4, 64], [B, H/2, W/2, 32]]
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv_bn_relu, BasicBlock
from ...ops.pooling import avg_pool2d
from ...ops.interpolate import upsample_2d


class _DeepPrunerBackboneBase(nn.Module):
    in_planes: int = 3
    batch_norm: bool = True
    dtype: Any = jnp.float32
    fast: bool = False

    def setup(self):
        bn, dt = self.batch_norm, self.dtype
        self.firstconv = [conv_bn_relu(bn, 32, 3, 2, 1, 1, bias=False, dtype=dt),
                          conv_bn_relu(bn, 32, 3, 1, 1, 1, bias=False, dtype=dt),
                          conv_bn_relu(bn, 32, 3, 1, 1, 1, bias=False, dtype=dt)]

        def layer(out_planes, blocks, stride, padding, dilation, in_planes):
            mods = [BasicBlock(out_planes, stride, padding, dilation, bn,
                               downsample=(stride != 1 or
                                           in_planes != out_planes),
                               dtype=dt)]
            mods += [BasicBlock(out_planes, 1, padding, dilation, bn,
                                dtype=dt) for _ in range(blocks - 1)]
            return mods

        self.layer1 = layer(32, 3, 1, 1, 1, 32)
        self.layer2 = layer(64, 16, 2, 1, 1, 32)
        if self.fast:
            # Fast: layer3 strides again (1/8), no dilation
            self.layer3 = layer(128, 3, 2, 1, 1, 64)
            self.layer4 = layer(128, 3, 1, 1, 1, 128)
            self.branch_pools = (32, 16, 8)
        else:
            self.layer3 = layer(128, 3, 1, 1, 1, 64)
            self.layer4 = layer(128, 3, 1, 2, 2, 128)
            self.branch_pools = (64, 32, 16, 8)
        self.branch_convs = [conv_bn_relu(bn, 32, 1, 1, 0, 1, bias=False,
                                          dtype=dt)
                             for _ in self.branch_pools]
        self.lastconv1 = conv_bn_relu(bn, 128, 3, 1, 1, 1, bias=False,
                                      dtype=dt)
        self.lastconv2 = nn.Conv(32, (1, 1), use_bias=False, dtype=dt,
                                 param_dtype=jnp.float32)

    def _forward(self, x, train):
        for m in self.firstconv:
            x = m(x, train)
        out_2_1 = x
        for m in self.layer1:
            out_2_1 = m(out_2_1, train)
        out_4_0 = out_2_1
        for m in self.layer2:
            out_4_0 = m(out_4_0, train)
        out_4_1 = out_4_0
        for m in self.layer3:
            out_4_1 = m(out_4_1, train)
        out_8 = out_4_1
        for m in self.layer4:
            out_8 = m(out_8, train)

        h, w = out_8.shape[1], out_8.shape[2]
        branches = [upsample_2d(conv(avg_pool2d(out_8, min(k, h, w)), train),
                                h, w, align_corners=True)
                    for k, conv in zip(self.branch_pools, self.branch_convs)]
        if self.fast:
            feat = jnp.concatenate([out_4_1, out_8] + branches[::-1], axis=-1)
            guides = [out_4_0, out_2_1]
        else:
            feat = jnp.concatenate([out_4_0, out_8] + branches[::-1], axis=-1)
            guides = [out_2_1]
        feat = self.lastconv2(self.lastconv1(feat, train))
        return feat, guides

    def __call__(self, left, right, train: bool = False):
        return self._forward(left, train), self._forward(right, train)


class DeepPrunerBestBackbone(_DeepPrunerBackboneBase):
    fast: bool = False


class DeepPrunerFastBackbone(_DeepPrunerBackboneBase):
    fast: bool = True
