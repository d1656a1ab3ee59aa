"""Shared Flax layers: conv/BN/ReLU factories (2-D & 3-D), residual block,
PSMNet 3-D hourglass.

Parity targets: dmb/modeling/stereo/layers/basic_layers.py:7-243 and
dmb/modeling/stereo/cost_processors/utils/hourglass.py:8-86.

TPU-first choices:
- Channels-last layouts ([B, H, W, C] / [B, D, H, W, C]) so XLA maps convs
  onto the MXU without transposes.
- A compute dtype knob (bf16 on TPU) with f32 params and f32 BatchNorm
  statistics; BN under jit+GSPMD reduces over the *global* batch, giving
  synced-BN parity with the reference's apex syncBN for free.
- Transposed conv implemented directly with lax.conv_general_dilated
  (lhs_dilation) and explicit padding so output shapes match torch's
  ConvTranspose formula (out = (in-1)*s - 2p + k + output_padding) exactly.
"""

import os
from typing import Any, Sequence, Union

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from ..ops import conv3d as conv3d_ops


def _tuple(x, n):
    if isinstance(x, (tuple, list)):
        assert len(x) == n
        return tuple(x)
    return (x,) * n


def consistent_padding_with_dilation(padding, dilation, dims):
    """padding[d] = dilation[d] when dilation > 1 (basic_layers.py:14-28)."""
    padding = _tuple(padding, dims)
    dilation = _tuple(dilation, dims)
    padding = tuple(d if d > 1 else p for p, d in zip(padding, dilation))
    return padding, dilation


class PackedBatchNorm(nn.Module):
    """BatchNorm over the TRUE channel axis of a packed volume.

    Input [B, R, H, W, pack*C] in the trunk-packed layout (packed channel
    p*C+c is true channel c at depth offset p). Variable names, shapes and
    semantics match flax nn.BatchNorm(momentum=0.9, epsilon=1e-5,
    dtype=f32) on the unpacked [B, D, H, W, C] volume exactly — scale/bias
    params and mean/var batch_stats are all (C,) — so a checkpoint trained
    unpacked runs packed and vice versa (instantiate with name="BatchNorm_0"
    to keep module paths identical).
    """
    pack: int
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    # number of true channels; only needed for return_folded (where no
    # input tensor is available to infer it from)
    features: int = 0

    @nn.compact
    def __call__(self, xp, return_folded=False):
        """Normal mode: normalize the packed volume.

        return_folded=True (eval only): do not touch xp (may be None) —
        return the equivalent per-true-channel affine (inv, fold_bias) with
        BN(y) == y * inv + fold_bias, so the caller can fuse the eval-mode
        BN into a conv epilogue (ops/pallas/packed_conv3d_kernel.py).
        Parameter declaration order is identical in both modes, so the
        variable tree is unchanged.
        """
        c = self.features if xp is None else xp.shape[-1] // self.pack
        assert c > 0, "features required when xp is None"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if return_folded:
            assert self.use_running_average, \
                "folded BN is an eval-only transformation"
            inv = scale * lax.rsqrt(ra_var.value + self.epsilon)
            return inv, bias - ra_mean.value * inv
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xp.astype(jnp.float32).reshape(
                xp.shape[:-1] + (self.pack, c))
            axes = tuple(range(xf.ndim - 1))  # all but true-channel
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        tile = lambda v: jnp.tile(v, self.pack)
        inv = tile(scale) * lax.rsqrt(tile(var) + self.epsilon)
        return (xp.astype(jnp.float32) - tile(mean)) * inv + tile(bias)


class ConvTransposeExact(nn.Module):
    """Transposed conv with torch ConvTranspose{2,3}d shape semantics.

    out = (in - 1) * stride - 2 * padding + kernel + output_padding.
    Implemented as an input-dilated convolution: lhs_dilation=stride with
    explicit per-edge padding (k-1-p, k-1-p+output_padding). The kernel is
    not spatially flipped (irrelevant for randomly-initialized weights).
    """
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 2
    padding: Union[int, Sequence[int]] = 1
    output_padding: Union[int, Sequence[int]] = 1
    dims: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32
    # pack > 1: input/output are trunk-packed [B, R, H, W, pack*C] volumes
    # (ops/conv3d.py); only the k3/s2/p1/op1 3-D case is supported packed.
    pack: int = 1
    # phase_form: return the k3/s2 1-channel head's output in PHASE LAYOUT
    # [B, D/pack, H, W, pack*8] (ops/conv3d.conv3d_transpose_s2_c1_phase_form)
    # instead of the materialized [B, 2D, 2H, 2W, 1] volume — for consumers
    # that reduce over D (phase_soft_argmin). Same "kernel"/"bias" params as
    # the direct form, so checkpoints are interchangeable.
    phase_form: bool = False
    # phase_out_blocks > 1 additionally folds that many output depth blocks
    # into lanes (effective pack becomes phase_out_blocks*pack) — the
    # lane-widening trade for the 16-lane head conv (ops/conv3d.py).
    phase_out_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        ks = _tuple(self.kernel_size, self.dims)
        ss = _tuple(self.stride, self.dims)
        ps = _tuple(self.padding, self.dims)
        ops = _tuple(self.output_padding, self.dims)
        in_features = x.shape[-1] // self.pack
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            ks + (in_features, self.features), jnp.float32)
        if self.phase_form:
            assert (self.dims == 3 and self.features == 1
                    and ks == (3, 3, 3) and ss == (2, 2, 2)
                    and ps == (1, 1, 1) and ops == (1, 1, 1)), (
                        "phase_form supports only the k3/s2/p1/op1 c1 head")
            out = conv3d_ops.conv3d_transpose_s2_c1_phase_form(
                x.astype(self.dtype), kernel.astype(self.dtype),
                pack=self.pack, out_blocks=self.phase_out_blocks)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (1,), jnp.float32)
                out = out + bias.astype(self.dtype)
            return out  # [B, D/pack, H, W, pack*8] phase-form
        if (self.dims == 3 and self.features == 1 and ks == (3, 3, 3)
                and ss == (2, 2, 2) and ps == (1, 1, 1)
                and ops == (1, 1, 1)
                and os.environ.get("DMB_C1_S2_PHASE") == "1"):
            # 1-channel 2x cost head (GCNet layer 37) via the 8-phase conv
            # (ops/conv3d.conv3d_transpose_s2_c1_phase). Bench-only
            # (DMB_C1_S2_PHASE=1): measured v5e end-to-end 219.7 ms vs
            # 210.6 for the packed lowering — the unpack + pixel-shuffle
            # relayouts outweigh the 2-lane deconv it removes.
            xin = x
            if self.pack > 1:
                xin = conv3d_ops.unpack_volume(x, self.pack)
            out = conv3d_ops.conv3d_transpose_s2_c1_phase(
                xin.astype(self.dtype), kernel.astype(self.dtype))[..., None]
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (1,), jnp.float32)
                out = out + bias.astype(self.dtype)
            return out  # UNPACKED [B, 2D, 2H, 2W, 1] even for packed input
        if self.pack > 1:
            assert self.dims == 3 and ks == (3, 3, 3) and ss == (2, 2, 2) \
                and ps == (1, 1, 1) and ops == (1, 1, 1), (
                    ks, ss, ps, ops)
            out = conv3d_ops.conv3d_transpose_packed(
                x.astype(self.dtype), kernel.astype(self.dtype), self.pack)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                out = out + jnp.tile(bias, self.pack).astype(self.dtype)
            return out
        if (self.dims == 3 and self.features == 1 and in_features == 1
                and ks == (8, 8, 8) and ss == (4, 4, 4) and ps == (2, 2, 2)
                and ops == (0, 0, 0)):
            # AcfNet's 1-channel 4x cost upsampler: the direct lhs-dilated
            # lowering is pathological on TPU (C=1 minor dim tile-pads
            # 256x in HBM); use the 64-phase lowering (ops/conv3d.py).
            out = conv3d_ops.conv3d_transpose_c1_phase(
                x.astype(self.dtype), kernel.astype(self.dtype))[..., None]
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (1,), jnp.float32)
                out = out + bias.astype(self.dtype)
            return out
        pad = [(k - 1 - p, k - 1 - p + op)
               for k, p, op in zip(ks, ps, ops)]
        lhs_spec = "N" + "DHW"[3 - self.dims:] + "C"
        rhs_spec = "DHW"[3 - self.dims:] + "IO"
        # same-dtype conv (no preferred_element_type): mixing a f32
        # accumulator output with bf16 operands breaks the transpose rule
        # under grad (the cotangent arrives f32 against bf16 kernels); the
        # MXU still accumulates in f32 internally for bf16 inputs
        if self.dims == 3 and conv3d_ops.use_tapped():
            out = conv3d_ops.conv3d_transpose_tapped(
                x.astype(self.dtype), kernel.astype(self.dtype),
                strides=ss, padding=ps, output_padding=ops)
        else:
            out = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1,) * self.dims, padding=pad,
                lhs_dilation=ss, rhs_dilation=(1,) * self.dims,
                dimension_numbers=(lhs_spec, rhs_spec, lhs_spec))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


class DispatchConv3D(nn.Module):
    """Drop-in nn.Conv (3-D) replacement routing through conv3d_apply —
    the globally selected MXU schedule ('auto' picks the per-shape best
    of direct XLA / dpack / opack; see ops/conv3d.py measurements).

    Parameter names/shapes/init match flax nn.Conv ([kd,kh,kw,I,O] "kernel",
    "bias"), so checkpoints and the torch converter are layout-compatible;
    ConvUnit instantiates it under the name "Conv_0" to keep module paths
    identical to the XLA path.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (1, 1, 1)
    kernel_dilation: Sequence[int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32
    pack: int = 1  # > 1: trunk-packed input/output (ops/conv3d.py)

    @nn.compact
    def __call__(self, x, epilogue=None):
        """epilogue: optional (scale[Co], bias[Co], relu) — a per-channel
        affine (+ReLU) fused after the conv (eval-mode folded BN). On the
        packed stride-1 Pallas route the epilogue runs inside the kernel;
        otherwise it is applied as plain elementwise ops (same math).

        ``x`` may be a TUPLE of volumes: conv(concat(parts)) is evaluated
        as sum(conv(part, kernel_slice)) without materializing the concat
        — exact by linearity (kernel sliced along Ci in part order, one
        shared param). GCNet's dense skip concats feed stride-2 convs whose
        concat/pad relayouts cost ~40 ms/iter at 384x1248 (xplane, round
        4); the split form reads each part in its existing layout.
        """
        parts = x if isinstance(x, (tuple, list)) else (x,)
        ci_parts = [p.shape[-1] // self.pack for p in parts]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (sum(ci_parts), self.features),
            jnp.float32)

        if len(parts) > 1:
            conv_bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,),
                                   jnp.float32) if self.use_bias else None
            out = None
            lo = 0
            for p, ci in zip(parts, ci_parts):
                ks = kernel[..., lo:lo + ci, :].astype(self.dtype)
                lo += ci
                if self.pack > 1:
                    y = conv3d_ops.conv3d_packed(
                        p.astype(self.dtype), ks, self.pack,
                        strides=tuple(self.strides),
                        padding=tuple(self.padding),
                        dilation=tuple(self.kernel_dilation))
                else:
                    y = conv3d_ops.conv3d_apply(
                        p.astype(self.dtype), ks,
                        strides=tuple(self.strides),
                        padding=tuple(self.padding),
                        dilation=tuple(self.kernel_dilation))
                out = y if out is None else out + y
            tile = self.pack if self.pack > 1 else 1
            if epilogue is not None:
                scale, ebias, relu = epilogue
                full_bias = ebias if conv_bias is None \
                    else conv_bias * scale + ebias
                out = out.astype(jnp.float32) * jnp.tile(scale, tile) \
                    + jnp.tile(full_bias, tile)
                if relu:
                    out = nn.relu(out)
                return out.astype(self.dtype)
            if conv_bias is not None:
                out = out + jnp.tile(conv_bias, tile).astype(out.dtype)
            return out.astype(self.dtype)
        x = parts[0]
        conv_bias = None
        if self.use_bias:
            conv_bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)
        if epilogue is not None and self.pack > 1:
            scale, ebias, relu = epilogue
            # fold the conv bias: (y + b) * s + e == y * s + (b * s + e)
            full_bias = ebias if conv_bias is None \
                else conv_bias * scale + ebias
            if conv3d_ops.packed_pallas_eligible(
                    x.shape, kernel.shape, tuple(self.strides),
                    tuple(self.padding), tuple(self.kernel_dilation),
                    self.pack):
                from ..ops.pallas.packed_conv3d_kernel import (
                    conv3d_packed_s1_pallas)
                h = x.shape[2]
                h_t = 16 if h % 16 == 0 else 8
                return conv3d_packed_s1_pallas(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    scale, full_bias, pack=self.pack, relu=relu,
                    h_tile=h_t)
            out = conv3d_ops.conv3d_packed(
                x.astype(self.dtype), kernel.astype(self.dtype), self.pack,
                strides=tuple(self.strides), padding=tuple(self.padding),
                dilation=tuple(self.kernel_dilation))
            out = out.astype(jnp.float32) * jnp.tile(scale, self.pack) \
                + jnp.tile(full_bias, self.pack)
            if relu:
                out = nn.relu(out)
            return out.astype(self.dtype)
        if self.pack > 1:
            out = conv3d_ops.conv3d_packed(
                x.astype(self.dtype), kernel.astype(self.dtype), self.pack,
                strides=tuple(self.strides), padding=tuple(self.padding),
                dilation=tuple(self.kernel_dilation))
        else:
            out = conv3d_ops.conv3d_apply(
                x.astype(self.dtype), kernel.astype(self.dtype),
                strides=tuple(self.strides), padding=tuple(self.padding),
                dilation=tuple(self.kernel_dilation))
        if conv_bias is not None:
            if self.pack > 1:
                out = out + jnp.tile(conv_bias, self.pack).astype(self.dtype)
            else:
                out = out + conv_bias.astype(self.dtype)
        return out


class DispatchConv2D(nn.Module):
    """nn.Conv (2-D, 3x3/s1/pad==dilation) replacement on ROW-PACKED
    images [B, H/pack, W, pack*C] via ops/conv3d.conv2d_rowpacked — the
    full-resolution lane-starvation fix for refinement/backbone 2-D convs
    (same economics as the 3-D trunk packing). Parameter names/shapes match
    nn.Conv ("kernel" [3,3,I,O], "bias") so checkpoints are compatible.
    """
    features: int
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    pack: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1] // self.pack, self.features), jnp.float32)
        out = conv3d_ops.conv2d_rowpacked(
            x.astype(self.dtype), kernel.astype(self.dtype), self.pack,
            (self.dilation, self.dilation))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + jnp.tile(bias, self.pack).astype(self.dtype)
        return out


class ConvUnit(nn.Module):
    """conv[Transpose] -> optional BN -> optional ReLU, order switchable.

    One module covers the reference's conv_bn / conv_bn_relu / bn_relu_conv /
    deconv*_bn(_relu) factory zoo for both 2-D and 3-D (basic_layers.py).
    ``pre_norm=True`` gives the bn_relu_conv ordering.
    """
    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    dims: int = 2
    batch_norm: bool = True
    relu: bool = True
    pre_norm: bool = False
    bias: bool = True
    transpose: bool = False
    output_padding: int = 0
    dtype: Any = jnp.float32
    # pack > 1: this unit's input/output live in the trunk-packed layout
    # [B, D/pack, H, W, pack*C]; conv/deconv/BN all apply packed with
    # variable names/shapes identical to the unpacked unit.
    pack: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (tuple, list)):
            # split-concat form: conv(concat(x)) as sum of sliced-kernel
            # convs (DispatchConv3D docstring). Only the plain 3-D
            # conv(+BN/ReLU) shape of the unit supports it.
            assert self.dims == 3 and not self.transpose \
                and not self.pre_norm, "tuple input needs a plain 3-D conv"
            x = tuple(p.astype(self.dtype) for p in x)
        else:
            x = x.astype(self.dtype)

        def norm(h):
            if not self.batch_norm:
                return h
            if self.pack > 1:
                return PackedBatchNorm(
                    pack=self.pack, use_running_average=not train,
                    name="BatchNorm_0")(h).astype(self.dtype)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, axis_name=None)(h).astype(self.dtype)

        if self.pre_norm:
            x = norm(x)
            x = nn.relu(x) if self.relu else x

        # Eval-mode conv+BN+ReLU fusion on the packed 3-D path: fold the
        # running-stat BN into a per-channel affine and hand it to the conv
        # as an epilogue (runs inside the Pallas kernel when that schedule
        # is active, as plain elementwise ops otherwise — same math either
        # way, so this is a pure fusion, not a numerics change).
        if (self.pack > 1 and self.dims == 3 and self.batch_norm
                and not self.pre_norm and not self.transpose and not train):
            inv, fold_bias = PackedBatchNorm(
                pack=self.pack, use_running_average=True,
                features=self.features, name="BatchNorm_0")(
                    None, return_folded=True)
            padding, dilation = consistent_padding_with_dilation(
                self.padding, self.dilation, self.dims)
            return DispatchConv3D(
                features=self.features, kernel_size=_tuple(self.kernel_size, 3),
                strides=_tuple(self.stride, 3), padding=padding,
                kernel_dilation=dilation, use_bias=self.bias,
                dtype=self.dtype, pack=self.pack, name="Conv_0")(
                    x, epilogue=(inv, fold_bias, self.relu)).astype(self.dtype)

        if self.transpose:
            x = ConvTransposeExact(
                features=self.features, kernel_size=self.kernel_size,
                stride=self.stride, padding=self.padding,
                output_padding=self.output_padding, dims=self.dims,
                use_bias=self.bias, dtype=self.dtype, pack=self.pack,
                name="ConvTransposeExact_0")(x)
        else:
            padding, dilation = consistent_padding_with_dilation(
                self.padding, self.dilation, self.dims)
            if self.dims == 3 and (self.pack > 1 or conv3d_ops.use_custom()
                                   or isinstance(x, tuple)):
                x = DispatchConv3D(
                    features=self.features,
                    kernel_size=_tuple(self.kernel_size, 3),
                    strides=_tuple(self.stride, 3), padding=padding,
                    kernel_dilation=dilation, use_bias=self.bias,
                    dtype=self.dtype, pack=self.pack, name="Conv_0")(x)
            elif self.dims == 2 and self.pack > 1:
                # row-packed 2-D schedule: 3x3 s1 'same' dilated convs only
                assert (_tuple(self.kernel_size, 2) == (3, 3)
                        and _tuple(self.stride, 2) == (1, 1)
                        and tuple(padding) == tuple(dilation)), (
                    self.kernel_size, self.stride, padding, dilation)
                x = DispatchConv2D(
                    features=self.features, dilation=dilation[0],
                    use_bias=self.bias, dtype=self.dtype, pack=self.pack,
                    name="Conv_0")(x)
            else:
                x = nn.Conv(
                    features=self.features,
                    kernel_size=_tuple(self.kernel_size, self.dims),
                    strides=_tuple(self.stride, self.dims),
                    padding=[(p, p) for p in padding],
                    kernel_dilation=dilation, use_bias=self.bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)

        if not self.pre_norm:
            x = norm(x)
            x = nn.relu(x) if self.relu else x
        return x


def conv_bn(batch_norm, features, kernel_size=3, stride=1, padding=1,
            dilation=1, bias=True, dtype=jnp.float32, pack=1):
    return ConvUnit(features, kernel_size, stride, padding, dilation, dims=2,
                    batch_norm=batch_norm, relu=False, bias=bias, dtype=dtype,
                    pack=pack)


def conv_bn_relu(batch_norm, features, kernel_size=3, stride=1, padding=1,
                 dilation=1, bias=True, dtype=jnp.float32, pack=1):
    return ConvUnit(features, kernel_size, stride, padding, dilation, dims=2,
                    batch_norm=batch_norm, relu=True, bias=bias, dtype=dtype,
                    pack=pack)


def bn_relu_conv(batch_norm, features, kernel_size=3, stride=1, padding=1,
                 dilation=1, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dilation, dims=2,
                    batch_norm=batch_norm, relu=True, pre_norm=True,
                    bias=bias, dtype=dtype)


def conv3d_bn(batch_norm, features, kernel_size=3, stride=1, padding=1,
              dilation=1, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dilation, dims=3,
                    batch_norm=batch_norm, relu=False, bias=bias, dtype=dtype)


def conv3d_bn_relu(batch_norm, features, kernel_size=3, stride=1, padding=1,
                   dilation=1, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dilation, dims=3,
                    batch_norm=batch_norm, relu=True, bias=bias, dtype=dtype)


def bn_relu_conv3d(batch_norm, features, kernel_size=3, stride=1, padding=1,
                   dilation=1, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dilation, dims=3,
                    batch_norm=batch_norm, relu=True, pre_norm=True,
                    bias=bias, dtype=dtype)


def deconv3d_bn(batch_norm, features, kernel_size=4, stride=2, padding=1,
                output_padding=0, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dims=3,
                    batch_norm=batch_norm, relu=False, bias=bias,
                    transpose=True, output_padding=output_padding,
                    dtype=dtype)


def deconv3d_bn_relu(batch_norm, features, kernel_size=4, stride=2, padding=1,
                     output_padding=0, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dims=3,
                    batch_norm=batch_norm, relu=True, bias=bias,
                    transpose=True, output_padding=output_padding,
                    dtype=dtype)


def deconv_bn_relu(batch_norm, features, kernel_size=4, stride=2, padding=1,
                   output_padding=0, bias=True, dtype=jnp.float32):
    return ConvUnit(features, kernel_size, stride, padding, dims=2,
                    batch_norm=batch_norm, relu=True, bias=bias,
                    transpose=True, output_padding=output_padding,
                    dtype=dtype)


class BasicBlock(nn.Module):
    """ResNet basic block (basic_layers.py:217-243). expansion = 1.

    pack > 1: input/output live in the row-packed layout
    [B, H/pack, W, pack*C] (stride-1 'same' blocks only)."""
    features: int
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    batch_norm: bool = True
    downsample: bool = False
    dtype: Any = jnp.float32
    pack: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Row-packed layout is only defined for stride-1 'same' blocks; the
        # downsample conv_bn below does not take `pack` and would silently
        # mix packed rows if reached with pack > 1.
        assert not (self.pack > 1 and (self.downsample or self.stride != 1)), (
            "BasicBlock: pack > 1 requires stride=1 and downsample=False")
        out = conv_bn_relu(self.batch_norm, self.features, 3, self.stride,
                           self.padding, self.dilation, bias=False,
                           dtype=self.dtype, pack=self.pack)(x, train)
        out = conv_bn(self.batch_norm, self.features, 3, 1, self.padding,
                      self.dilation, bias=False, dtype=self.dtype,
                      pack=self.pack)(out, train)
        if self.downsample:
            x = conv_bn(self.batch_norm, self.features, 1, self.stride, 0, 1,
                        dtype=self.dtype)(x, train)
        return out + x


class HWHourglass(nn.Module):
    """DeepPruner 3-D hourglass striding only H and W (not disparity).

    Parity: dmb/modeling/stereo/cost_processors/utils/hw_hourglass.py:8-105
    — 3 down stages (stride (1,2,2)) with residual convs, 3 transposed-conv
    up stages (output_padding (0,1,1)) with additive skips.
    """
    features: int
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn, dt, c = self.batch_norm, self.dtype, self.features

        def down(features, h):
            a = ConvUnit(features, 3, (1, 2, 2), 1, dims=3, batch_norm=bn,
                         relu=True, bias=False, dtype=dt)(h, train)
            b = ConvUnit(features, 3, 1, 1, dims=3, batch_norm=bn,
                         relu=True, bias=False, dtype=dt)(a, train)
            return a + b

        def up(features, h):
            return ConvUnit(features, 3, (1, 2, 2), 1, dims=3, batch_norm=bn,
                            relu=False, bias=False, transpose=True,
                            output_padding=(0, 1, 1), dtype=dt)(h, train)

        out1 = down(c * 2, x)         # [*, D, H/2, W/2]
        out2 = down(c * 4, out1)      # [*, D, H/4, W/4]
        out3 = down(c * 8, out2)      # [*, D, H/8, W/8]
        u3 = up(c * 4, out3) + out2
        u2 = up(c * 2, u3) + out1
        return up(c, u2)


class Hourglass3D(nn.Module):
    """PSMNet 3-D hourglass with pre/post skip wiring (hourglass.py:8-86).

    Input [B, D, H, W, C]; strides only touch H and W?? — no: the PSMNet
    hourglass strides D, H and W together (kernel 3, stride 2 on all three).
    Returns (out, pre, post) like the reference so stacked hourglasses can
    cross-wire their skip connections.
    """
    features: int  # C of the input volume
    batch_norm: bool = True
    dtype: Any = jnp.float32
    pack: int = 1  # > 1: all tensors in trunk-packed layout (ops/conv3d.py)
    # Under a D-sharded cost volume, pin the strided convs' operands and
    # results to this (batch-only) sharding: XLA's SPMD partitioner
    # miscompiles window-strided convs over a sharded dim (see
    # parallel/mesh.batch_only_volume_sharding). Propagation would
    # otherwise re-shard interior tensors from the D-sharded skip adds.
    strided_sharding: Any = None

    @nn.compact
    def __call__(self, x, presqu=None, postsqu=None, train: bool = False):
        c2 = self.features * 2
        bn, dt, pk = self.batch_norm, self.dtype, self.pack

        def unit(features, stride=1, relu=True, transpose=False):
            return ConvUnit(features, 3, stride, 1, dims=3, batch_norm=bn,
                            relu=relu, bias=False, transpose=transpose,
                            output_padding=1 if transpose else 0,
                            dtype=dt, pack=pk)

        def pin(h):
            if self.strided_sharding is not None:
                import jax
                return jax.lax.with_sharding_constraint(
                    h, self.strided_sharding)
            return h

        out = pin(unit(c2, stride=2)(pin(x), train))                # 1/2
        pre = unit(c2, relu=False)(out, train)
        if postsqu is not None:
            pre = nn.relu(pre + postsqu)
        else:
            pre = nn.relu(pre)

        out = pin(unit(c2, stride=2)(pin(pre), train))              # 1/4
        out = unit(c2)(out, train)

        up1 = unit(c2, stride=2, relu=False, transpose=True)(out, train)
        post = nn.relu(up1 + (presqu if presqu is not None else pre))  # 1/2

        out = unit(self.features, stride=2, relu=False,
                   transpose=True)(post, train)                     # 1/1
        return out, pre, post
