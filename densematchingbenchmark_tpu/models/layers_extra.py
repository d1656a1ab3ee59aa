"""Extra layer inventory: 2-D hourglass, dilated 3-D hourglass, DenseASPP.

Parity targets (all unused by shipped reference configs but part of the
component inventory, SURVEY.md §2):
  dmb/modeling/stereo/cost_processors/utils/hourglass_2d.py:8-86
  dmb/modeling/stereo/layers/dilated_hourglass.py:8-64
  dmb/modeling/stereo/backbones/utils/DenseASPP.py:7-94
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import (conv_bn, conv_bn_relu, conv3d_bn, conv3d_bn_relu,
                     ConvUnit)


class Hourglass2D(nn.Module):
    """PSMNet hourglass on 2-D maps (stride-2 down x2, deconv up x2,
    pre/post skip wiring). Returns (out, pre, post)."""
    features: int
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu=None, postsqu=None, train: bool = False):
        bn, dt, c2 = self.batch_norm, self.dtype, self.features * 2
        out = conv_bn_relu(bn, c2, 3, 2, 1, bias=False, dtype=dt)(x, train)
        pre = conv_bn(bn, c2, 3, 1, 1, bias=False, dtype=dt)(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)
        out = conv_bn_relu(bn, c2, 3, 2, 1, bias=False, dtype=dt)(pre, train)
        out = conv_bn_relu(bn, c2, 3, 1, 1, bias=False, dtype=dt)(out, train)
        up1 = ConvUnit(c2, 3, 2, 1, dims=2, batch_norm=bn, relu=False,
                       bias=False, transpose=True, output_padding=1,
                       dtype=dt)(out, train)
        post = nn.relu(up1 + (presqu if presqu is not None else pre))
        out = ConvUnit(self.features, 3, 2, 1, dims=2, batch_norm=bn,
                       relu=False, bias=False, transpose=True,
                       output_padding=1, dtype=dt)(post, train)
        return out, pre, post


class DilatedHourglass3D(nn.Module):
    """3-D hourglass variant keeping the PSMNet wiring (dilated-experiments
    utility; layers/dilated_hourglass.py). Structure matches Hourglass3D
    with stride-2 on (D, H, W)."""
    features: int
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu=None, postsqu=None, train: bool = False):
        bn, dt, c2 = self.batch_norm, self.dtype, self.features * 2
        out = conv3d_bn_relu(bn, c2, 3, 2, 1, bias=False, dtype=dt)(x, train)
        pre = conv3d_bn(bn, c2, 3, 1, 1, bias=False, dtype=dt)(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)
        out = conv3d_bn_relu(bn, c2, 3, 2, 1, bias=False, dtype=dt)(pre,
                                                                    train)
        out = conv3d_bn_relu(bn, c2, 3, 1, 1, bias=False, dtype=dt)(out,
                                                                    train)
        up1 = ConvUnit(c2, 3, 2, 1, dims=3, batch_norm=bn, relu=False,
                       bias=False, transpose=True, output_padding=1,
                       dtype=dt)(out, train)
        post = nn.relu(up1 + (presqu if presqu is not None else pre))
        out = ConvUnit(self.features, 3, 2, 1, dims=3, batch_norm=bn,
                       relu=False, bias=False, transpose=True,
                       output_padding=1, dtype=dt)(post, train)
        return out, pre, post


class DenseAsppBlock(nn.Module):
    """BN -> ReLU -> 1x1 conv -> BN -> ReLU -> dilated 3x3 conv."""
    mid_planes: int
    out_planes: int
    dilation: int
    dropout_rate: float = 0.0
    bn_start: bool = True
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        if self.bn_start and self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                             dtype=jnp.float32)(x).astype(dt)
        x = nn.relu(x)
        x = nn.Conv(self.mid_planes, (1, 1), dtype=dt,
                    param_dtype=jnp.float32)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                             dtype=jnp.float32)(x).astype(dt)
        x = nn.relu(x)
        x = nn.Conv(self.out_planes, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=dt, param_dtype=jnp.float32)(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class DenseAspp(nn.Module):
    """Dense ASPP: cascaded dilated blocks (3, 6, 12, 18, 24) with dense
    concatenation, fused to ``out_planes``."""
    in_planes: int
    out_planes: int
    dropout_rate: float = 0.0
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.in_planes // 2
        quarter = self.in_planes // 4
        feature = x
        for i, rate in enumerate((3, 6, 12, 18, 24)):
            block = DenseAsppBlock(mid, quarter, rate, self.dropout_rate,
                                   bn_start=(i > 0 and self.batch_norm),
                                   batch_norm=self.batch_norm,
                                   dtype=self.dtype)
            out = block(feature, train)
            feature = jnp.concatenate([out, feature], axis=-1)
        feature = conv_bn_relu(self.batch_norm, self.in_planes, 3, 1, 1,
                               bias=False, dtype=self.dtype)(feature, train)
        return nn.Conv(self.out_planes, (1, 1), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(feature)
