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

from ..layers import ConvUnit, DispatchConv3D, Hourglass3D
from ...ops.conv3d import pack_volume, unpack_volume
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
    # pack > 1: run the whole trunk in the D-packed layout (pack the raw
    # volume once, block-sparse packed kernels throughout, unpack the three
    # 1-channel classified costs at the end). Same params as pack<=1 — a
    # pure MXU schedule change, ~1.5-2x per conv on v5e
    # (tools/microbench_conv3d_packed.py). Requires (max_disp/4) % (4*pack)
    # == 0 (two stride-2 levels inside the hourglasses).
    pack: int = 0
    # D-sharded cost-volume support: strided_sharding (batch-only) is
    # constrained onto every hourglass input — XLA's SPMD partitioner
    # miscompiles window-STRIDED convs over a sharded dim (see
    # parallel/mesh.batch_only_volume_sharding) — and volume_sharding
    # (batch x D) is re-constrained for the stride-1 classify stage.
    strided_sharding: Any = None
    volume_sharding: Any = None
    # remat: rematerialize each hourglass in the backward pass
    # (jax.checkpoint per block). Peak training activation memory drops from
    # "all hourglass internals" to "one hourglass's internals + the block
    # boundaries", trading ~one extra trunk forward per step — the policy
    # that buys larger per-chip batches (reference analog: none; it ran
    # batch 3/GPU, SURVEY §2.13). Param tree names are unchanged (explicit
    # names below), so checkpoints are interchangeable across this knob.
    remat: bool = False

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
                            relu=relu, bias=False, dtype=dt, pack=pk)

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
