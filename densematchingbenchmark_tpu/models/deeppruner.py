"""DeepPruner meta-architecture: differentiable PatchMatch + range pruning.

Parity targets:
  dmb/modeling/stereo/models/DeepPruner.py:13-122 (2-stage pipeline)
  dmb/modeling/stereo/cost_processors/DeepPruner.py:11-234
    (ConfidenceRangePredictor, DeepPrunerProcessor)
  dmb/modeling/stereo/cost_processors/aggregators/DeepPruner.py:8-59
  dmb/modeling/stereo/disp_refinement/DeepPruner.py:8-94

Flow: backbone -> PatchMatch samples ('pre') -> ConfidenceRangePredictor
(twin HW-hourglass heads -> soft-argmin -> per-pixel [min, max] disparity)
-> uniform samples in the pruned range ('post') -> aggregation +
soft-argmin + 2x upsample -> cascaded refinement. The PatchMatch PRNG comes
from Flax's rng stream ('patch_match'), so training/eval remain pure.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (conv_bn_relu, conv3d_bn_relu, HWHourglass)
from ..ops.cost_volume import cat_volume
from ..ops.patch_match import (patch_match, uniform_sample,
                               adjust_sample_range)
from ..ops.interpolate import upsample_2d


class ConfidenceRangePredictor(nn.Module):
    """raw cost [B, D, H, W, C] + samples [B, D, H, W] ->
    (min_disp, max_disp [B, H, W, 1], min_feat, max_feat [B, D, H, W])."""
    hourglass_in_planes: int = 16
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_cost, disparity_sample, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        cost = conv3d_bn_relu(bn, 64, 3, 1, 1, bias=False, dtype=dt)(
            raw_cost, train)
        cost = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            cost, train)
        cost = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            cost, train)
        cost = conv3d_bn_relu(bn, self.hourglass_in_planes, 3, 1, 1,
                              bias=False, dtype=dt)(cost, train)

        def predict_head(x):
            x = HWHourglass(self.hourglass_in_planes, bn, dtype=dt)(x, train)
            x = conv3d_bn_relu(bn, self.hourglass_in_planes * 2, 3, 1, 1,
                               bias=False, dtype=dt)(x, train)
            x = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=dt,
                        param_dtype=jnp.float32)(x)
            return x[..., 0].astype(jnp.float32)      # [B, D, H, W]

        cost_for_min = predict_head(cost)
        cost_for_max = predict_head(cost)

        def regress(c):
            prob = jax.nn.softmax(c, axis=1)
            d = jnp.sum(prob * disparity_sample, axis=1)[..., None]
            # 5x5 conv + relu on the disparity map itself (no BN)
            d = nn.Conv(1, (5, 5), padding=2, use_bias=True,
                        dtype=jnp.float32)(d)
            return nn.relu(d)

        min_disp, max_disp = regress(cost_for_min), regress(cost_for_max)

        def feat(c):
            # D-channel feature map: channels-last conv over the D axis
            x = jnp.transpose(c, (0, 2, 3, 1)).astype(dt)
            x = conv_bn_relu(bn, c.shape[1], 5, 1, 2, bias=True, dtype=dt)(
                x, train)
            return jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))

        return min_disp, max_disp, feat(cost_for_min), feat(cost_for_max)


class DeepPrunerAggregator(nn.Module):
    """conv3d stack + HWHourglass + classify -> [B, D, H, W] cost."""
    hourglass_in_planes: int = 16
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_cost, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        cost = conv3d_bn_relu(bn, 64, 3, 1, 1, bias=False, dtype=dt)(
            raw_cost, train)
        cost = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            cost, train)
        cost = conv3d_bn_relu(bn, 32, 3, 1, 1, bias=False, dtype=dt)(
            cost, train)
        cost = conv3d_bn_relu(bn, self.hourglass_in_planes, 3, 1, 1,
                              bias=False, dtype=dt)(cost, train)
        cost = HWHourglass(self.hourglass_in_planes, bn, dtype=dt)(
            cost, train) + cost
        cost = conv3d_bn_relu(bn, self.hourglass_in_planes * 2, 3, 1, 1,
                              bias=False, dtype=dt)(cost, train)
        cost = nn.Conv(1, (3, 3, 3), padding=1, use_bias=False, dtype=dt,
                       param_dtype=jnp.float32)(cost)
        return cost[..., 0].astype(jnp.float32)


class RefinementHead(nn.Module):
    """Dilated conv stack on [guide ‖ disp] -> residual; ReLU clamp.

    pack > 1 runs the 6-conv 16/32-channel stack in the row-packed layout
    [B, H/pack, W, pack*C] (ops/conv3d.conv2d_rowpacked) — the same
    measured-win schedule as StereoNet's edge-aware trunk (DESIGN.md §6);
    identical params, auto-fallback when H %% pack != 0."""
    batch_norm: bool = True
    dtype: Any = jnp.float32
    pack: int = 0

    @nn.compact
    def __call__(self, init_disp, guide, train: bool = False):
        from ..ops.conv3d import pack_rows2d, unpack_rows2d
        bn, dt = self.batch_norm, self.dtype
        x = guide.astype(dt)
        pk = self.pack if self.pack and self.pack > 1 else 1
        if x.shape[1] % pk:
            pk = 1
        if pk > 1:
            x = pack_rows2d(x, pk)
        for planes, dil in ((32, 1), (32, 1), (32, 1), (16, 2), (16, 4),
                            (16, 1)):
            x = conv_bn_relu(bn, planes, 3, 1, dil, dil, bias=False,
                             dtype=dt, pack=pk)(x, train)
        if pk > 1:
            x = unpack_rows2d(x, pk)
        res = nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=dt,
                      param_dtype=jnp.float32)(x)
        return nn.relu(res.astype(jnp.float32) + init_disp)


class DeepPruner(nn.Module):
    backbone: nn.Module
    max_disp: int = 192
    scale: int = 4  # feature scale of the main stage (4 = Best, 8 = Fast)
    patch_match_sample_number: int = 14
    uniform_sample_number: int = 9
    propagation_filter_size: int = 3
    iterations: int = 3
    temperature: float = 7.0
    hourglass_in_planes: int = 16
    refinement_num: int = 1
    refinement_pack: int = 0  # see RefinementHead.pack
    # PatchMatch scoring schedule. MEASURED on v5e at 384x1280 (honest
    # distinct-input harness, whole-model, DeepPruner-4x):
    #   'corr'      gather-free windowed-tent contraction of a precomputed
    #               integer-shift correlation volume (identical numerics by
    #               dot-product linearity + the static per-interval sample
    #               bound; DESIGN.md §7)        48.2 ms  <- config default
    #   'warp'      f32 feature warps          136.3 ms (this field's
    #               default for generality: 'corr' needs a static [0, R]
    #               search range)
    #   'warp_bf16' compute-dtype feature warps 165.7 ms (bf16 (2,1)
    #               sublane-packed gathers lower WORSE despite half the
    #               bytes)
    # A DISCARDED round-3 'corr' variant that gathered scores along the
    # shift axis measured 213.6 ms (scalar-element axis-1 gathers); the
    # shipped tent contraction has zero gathers.
    pm_scoring: str = "warp"
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        (ref_fms, ref_guides), (tgt_fms, _) = self.backbone(left, right,
                                                            train=train)
        b, h, w, _ = ref_fms.shape
        feat_max_disp = self.max_disp // self.scale

        # --- 'pre': PatchMatch sampling over the full range
        key = self.make_rng("patch_match") if train else \
            jax.random.PRNGKey(0)
        zeros = jnp.zeros((b, h, w, 1), jnp.float32)
        if self.pm_scoring == "warp_bf16":
            pm_left, pm_right = ref_fms, tgt_fms
        else:
            pm_left = ref_fms.astype(jnp.float32)
            pm_right = tgt_fms.astype(jnp.float32)
        pm_samples = patch_match(
            pm_left, pm_right,
            zeros, zeros + feat_max_disp, key,
            self.patch_match_sample_number, self.propagation_filter_size,
            self.iterations, self.temperature,
            static_search_range=(feat_max_disp
                                 if self.pm_scoring == "corr" else None),
            batch_invariant_noise=not train)

        def build_cost(samples, extra_feats=()):
            raw = cat_volume(ref_fms, tgt_fms, self.max_disp,
                             disp_sample=samples)
            planes = [raw, samples[..., None]]
            for f in extra_feats:  # [B, D', H, W] broadcast over samples
                planes.append(jnp.broadcast_to(
                    jnp.transpose(f, (0, 2, 3, 1))[:, None],
                    raw.shape[:1] + (samples.shape[1],) + raw.shape[2:4] +
                    (f.shape[1],)))
            return jnp.concatenate(planes, axis=-1).astype(dt)

        min_d, max_d, min_feat, max_feat = ConfidenceRangePredictor(
            self.hourglass_in_planes, bn, dt)(
                build_cost(pm_samples), pm_samples, train)

        # --- 'post': uniform samples in the pruned, stretched range
        lo, hi = adjust_sample_range(min_d, max_d,
                                     self.uniform_sample_number,
                                     feat_max_disp)
        uni_samples = uniform_sample(lo, hi, self.uniform_sample_number)

        cost = DeepPrunerAggregator(self.hourglass_in_planes, bn, dt)(
            build_cost(uni_samples, (min_feat, max_feat)), train)

        prob = jax.nn.softmax(cost, axis=1)
        disparity = jnp.sum(prob * uni_samples, axis=1)[..., None]
        # 2x upsample (values doubled), 5x5 conv (no BN)
        h2, w2 = h * 2, w * 2
        disparity = upsample_2d(disparity * 2.0, h2, w2,
                                align_corners=False)
        disparity = nn.relu(nn.Conv(1, (5, 5), padding=2, use_bias=True,
                                    dtype=jnp.float32)(disparity))
        disp_feature = upsample_2d(
            jnp.transpose(cost, (0, 2, 3, 1)), h2, w2, align_corners=False)
        disp_feature = conv_bn_relu(bn, self.uniform_sample_number, 5, 1, 2,
                                    bias=True, dtype=dt)(
                                        disp_feature, train)

        # --- cascaded refinement on guide features ‖ disparity feature
        disps = [disparity]
        guides = [jnp.concatenate(
            [ref_guides[0].astype(dt), disp_feature], axis=-1)] + \
            [g.astype(dt) for g in ref_guides[1:]]
        for i in range(self.refinement_num):
            init = disps[-1]
            guide = jnp.concatenate([guides[i], init.astype(dt)], axis=-1)
            refined = RefinementHead(bn, dt, pack=self.refinement_pack)(
                init, guide, train)
            gh, gw = refined.shape[1] * 2, refined.shape[2] * 2
            refined = upsample_2d(refined * 2.0, gh, gw,
                                  align_corners=False)
            disps.append(refined)
        disps = disps[::-1]  # best first

        # full-resolution outputs; min/max appended for the quantile loss
        H, W = left.shape[1:3]

        def to_full(d):
            return upsample_2d(d * (W / d.shape[2]), H, W,
                               align_corners=False)

        disps = [to_full(d) for d in disps]
        min_full, max_full = to_full(min_d), to_full(max_d)
        out = {"disps": disps + [min_full, max_full], "costs": [],
               "min_disparity": min_full, "max_disparity": max_full}
        return out
