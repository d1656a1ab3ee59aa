"""GCNet 3-D encoder-decoder aggregator (layers 19-37).

Parity target: dmb/modeling/stereo/cost_processors/aggregators/GCNet.py:7-120.
Input: concat volume [B, max_disp/2, H/2, W/2, 2C] (C = 32); 4 stride-2
down stages with dense skip concats, 5 transposed-conv up stages with
additive skips; full-resolution single cost volume output.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import ConvUnit, ConvTransposeExact
from ...ops.conv3d import pack_volume, unpack_volume, concat_packed


class GCAggregator(nn.Module):
    max_disp: int = 192
    in_planes: int = 64  # channels of the raw concat volume
    batch_norm: bool = True
    dtype: Any = jnp.float32
    # Trunk-packed MXU schedule (ops/conv3d.py; see PSMAggregator.pack).
    # pack=2 is the divisibility-safe choice here: the 4 stride-2 stages
    # need even packed-row counts, i.e. (max_disp/2) % (16*pack) == 0.
    pack: int = 0
    # phase_argmin: emit the layer-37 cost head in phase form (the full-res
    # [B, 2D, 2H, 2W, 1] volume — 92M voxels, 28 ms/iter measured — is
    # never materialized; its only consumer is the soft-argmin over D,
    # evaluated in phase layout by ops/soft_argmin.phase_soft_argmin).
    # Requires GeneralizedStereoModel.phase_argmin (wired by the builder).
    phase_argmin: bool = False
    # split_concat: evaluate the dense skip concats' stride-2 convs as
    # sum-of-sliced-kernel convs (conv(cat(a,b)) == conv(a)+conv(b), exact
    # by linearity; shared param) instead of materializing the concat —
    # the concat/pad relayouts around cat(c18,c20) etc. cost ~40 ms/iter
    # at 384x1248 (round-4 xplane). See DispatchConv3D.
    split_concat: bool = True
    # D-sharded cost-volume support: the GC trunk is one strided
    # encoder-decoder, so under D-sharding the WHOLE trunk runs batch-only
    # (see PSMAggregator.strided_sharding / parallel/mesh docstring).
    strided_sharding: Any = None
    volume_sharding: Any = None
    # w_pad: static W alignment for the masked-pad eval schedule (0 = off).
    # XLA's spatial tiling of the full-res W=624 stages runs the trunk
    # convs at ~half the rate it achieves on aligned widths (round-4/5
    # xplane + tools/microbench_gcnet_c19.py); padding W up to a multiple
    # of `w_pad` (624 -> 640 at 384x1248) and re-zeroing the pad columns
    # after every conv/deconv unit is EXACT: a conv window that reaches
    # masked-zero columns sees the same zeros the unpadded conv's implicit
    # boundary padding provides, at every stride level (the mask width
    # follows the conv arithmetic: s2 vw -> (vw+1)//2, deconv vw -> 2*vw).
    # Eval/inference only: BN batch stats over padded W would include the
    # zero columns in train mode.
    w_pad: int = 0

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        if self.strided_sharding is not None:
            import jax
            raw_cost = jax.lax.with_sharding_constraint(
                raw_cost, self.strided_sharding)
        f = self.in_planes // 2
        b, d, h, w, _ = raw_cost.shape
        wp = 0
        if self.w_pad and not train:
            target = -(-w // self.w_pad) * self.w_pad
            if target > w and target % 16 == 0:
                wp = target - w
                raw_cost = jnp.pad(
                    raw_cost, ((0, 0),) * 3 + ((0, wp), (0, 0)))
        pk = self.pack if self.pack and self.pack > 1 else 1
        if pk > 1 and (d % (16 * pk) != 0 or h % 16
                       or raw_cost.shape[3] % 16):
            pk = 1  # safe fallback: same params, unpacked schedule
        if pk > 1:
            raw_cost = pack_volume(raw_cost, pk)

        def mask(x, vw):
            if not wp or x.shape[3] == vw:
                return x
            m = (jnp.arange(x.shape[3]) < vw).astype(x.dtype)
            return x * m[None, None, None, :, None]

        def conv(features, stride=1):
            return ConvUnit(features, 3, stride, 1, dims=3, batch_norm=bn,
                            relu=True, bias=False, dtype=dt, pack=pk)

        def deconv(features):
            return ConvUnit(features, 3, 2, 1, dims=3, batch_norm=bn,
                            relu=True, bias=False, transpose=True,
                            output_padding=1, dtype=dt, pack=pk)

        def cat(a, b):
            if self.split_concat:
                return (a, b)  # consumed by ConvUnit's split-concat form
            if pk > 1:
                return concat_packed([a, b], pk)
            return jnp.concatenate([a, b], -1)

        # valid (unmasked) widths per resolution level under the pad
        v0 = w
        v1 = (v0 + 1) // 2
        v2 = (v1 + 1) // 2
        v3 = (v2 + 1) // 2
        v4 = (v3 + 1) // 2

        c18 = raw_cost
        c19 = mask(conv(f)(c18, train), v0)
        c20 = mask(conv(f)(c19, train), v0)
        c21 = mask(conv(f * 2, 2)(cat(c18, c20), train), v1)  # 1/4
        c22 = mask(conv(f * 2)(c21, train), v1)
        c23 = mask(conv(f * 2)(c22, train), v1)
        c24 = mask(conv(f * 2, 2)(cat(c21, c23), train), v2)  # 1/8
        c25 = mask(conv(f * 2)(c24, train), v2)
        c26 = mask(conv(f * 2)(c25, train), v2)
        c27 = mask(conv(f * 2, 2)(cat(c24, c26), train), v3)  # 1/16
        c28 = mask(conv(f * 2)(c27, train), v3)
        c29 = mask(conv(f * 2)(c28, train), v3)
        c30 = mask(conv(f * 4, 2)(cat(c27, c29), train), v4)  # 1/32
        c31 = mask(conv(f * 4)(c30, train), v4)
        c32 = mask(conv(f * 4)(c31, train), v4)

        c33 = mask(deconv(f * 2)(c32, train), 2 * v4)
        c34 = mask(deconv(f * 2)(c33 + c29, train), 2 * v3)
        c35 = mask(deconv(f * 2)(c34 + c26, train), 2 * v2)
        c36 = mask(deconv(f)(c35 + c23, train), 2 * v1)
        po = 1
        if self.phase_argmin:
            # widen the head conv's output lanes toward 64 (16 lanes at
            # pk=2 measured lane-bound, 8.2 ms/iter — DESIGN.md §8):
            # largest divisor of dq with 8*pk*po <= 64 lanes (descending,
            # so a non-divisible exact candidate never overshoots the lane
            # target — ADVICE r4)
            dq = c36.shape[1]
            for cand in range(max(1, 64 // (8 * pk)), 0, -1):
                if dq % cand == 0:
                    po = cand
                    break
        c37 = ConvTransposeExact(1, 3, 2, 1, output_padding=1, dims=3,
                                 dtype=dt, pack=pk,
                                 phase_form=self.phase_argmin,
                                 phase_out_blocks=po,
                                 name="ConvTransposeExact_0")(c36 + c20)
        if self.phase_argmin:
            # [B, D/pk, H, W, pk*8] phase-form cost; the model's
            # phase_soft_argmin consumes it (pack inferred from channels).
            # Under the masked W-pad schedule, crop the pad columns here
            # (the phase W axis is at input resolution).
            if wp:
                c37 = c37[:, :, :, :v0, :]
            return [c37]
        if pk > 1 and c37.shape[-1] == pk:
            # packed head output (the bench-only DMB_C1_S2_PHASE=1 path
            # returns the volume already unpacked)
            c37 = unpack_volume(c37, pk)
        if wp:
            c37 = c37[:, :, :, :2 * v0]
        # stays in compute dtype: the full-res volume is HBM-bound and the
        # soft-argmin upcasts to f32 internally
        return [c37[..., 0]]
