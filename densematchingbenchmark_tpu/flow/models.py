"""Flow meta-architectures.

The reference ships flow data/eval/vis plumbing but registers ZERO flow
models (dmb/modeling/flow/models/__init__.py:2-4 has an empty
`_META_ARCHITECTURES = {}`), so everything registered here EXCEEDS the
reference's capability. The models are built from this framework's stereo
idiom — correlation volume -> 2-D aggregation convs -> softmax expectation
— generalized from a 1-D disparity search to a 2-D displacement search:

- `PWCFlow`: a PWC-Net-style coarse-to-fine pyramid (siamese encoder,
  backward feature warping by the upsampled coarse flow, local 2-D
  correlation, per-level residual flow via soft-argmax over the
  displacement window, dilated context refinement at the finest level).
  TPU-first: channels-last, the (2r+1)^2 displacement axis sits in lanes
  so aggregation convs contract a lane-aligned axis on the MXU, all
  control flow static under jit.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..models.layers import ConvUnit
from ..ops.cost_volume import correlation2d_volume
from ..ops.interpolate import upsample_2d
from ..ops.soft_argmin import soft_argmax_2d
from ..ops.warp import flow_warp


class FlowPyramidEncoder(nn.Module):
    """Siamese conv pyramid: level i is at stride 2**(i+1) of the input."""
    chans: Sequence[int] = (16, 32, 64, 96)
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        for c in self.chans:
            x = ConvUnit(c, kernel_size=3, stride=2, padding=1,
                         batch_norm=self.batch_norm, dtype=self.dtype)(
                             x, train)
            x = ConvUnit(c, kernel_size=3, stride=1, padding=1,
                         batch_norm=self.batch_norm, dtype=self.dtype)(
                             x, train)
            feats.append(x)
        return feats


class FlowEstimator(nn.Module):
    """Per-level residual flow: aggregate [corr | feat | up_flow] -> scores
    over the displacement window -> soft-argmax expectation."""
    radius: int
    hidden: int = 96
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr, ref_fm, up_flow, train: bool = False):
        n = (2 * self.radius + 1) ** 2
        x = jnp.concatenate(
            [corr, ref_fm, up_flow.astype(corr.dtype)], axis=-1)
        x = ConvUnit(self.hidden, batch_norm=self.batch_norm,
                     dtype=self.dtype)(x, train)
        x = ConvUnit(self.hidden, batch_norm=self.batch_norm,
                     dtype=self.dtype)(x, train)
        scores = ConvUnit(n, batch_norm=False, relu=False,
                          dtype=self.dtype)(x, train)
        return up_flow + soft_argmax_2d(scores, self.radius)


class ContextRefinement(nn.Module):
    """Dilated residual refinement on [feat | flow] at the finest level
    (the flow analog of the stereo EdgeAwareRefinement,
    dmb/modeling/stereo/disp_refinement/utils/edge_aware.py:8-69)."""
    hidden: int = 64
    dilations: Sequence[int] = (1, 2, 4, 8, 1)
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fm, flow, train: bool = False):
        x = jnp.concatenate([fm, flow.astype(fm.dtype)], axis=-1)
        for d in self.dilations:
            x = ConvUnit(self.hidden, padding=d, dilation=d,
                         batch_norm=self.batch_norm, dtype=self.dtype)(
                             x, train)
        res = ConvUnit(2, batch_norm=False, relu=False, dtype=self.dtype)(
            x, train)
        return flow + res.astype(jnp.float32)


class PWCFlow(nn.Module):
    """Coarse-to-fine correlation flow over a feature pyramid.

    Returns a dict with ``flows``: list of [B, H, W, 2] flow fields,
    best (full-resolution, refined) first, then each pyramid level
    fine -> coarse — the same best-first contract as the stereo models'
    ``disps`` (dmb general_stereo_model.py:60-78).
    """
    chans: Sequence[int] = (16, 32, 64, 96)
    radius: int = 4
    hidden: int = 96
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_img, tgt_img, train: bool = False):
        b, h, w, _ = ref_img.shape
        encoder = FlowPyramidEncoder(self.chans, self.batch_norm, self.dtype)
        ref_feats = encoder(ref_img.astype(self.dtype), train)
        tgt_feats = encoder(tgt_img.astype(self.dtype), train)

        flows = []  # coarse -> fine during the loop
        flow = None
        for lvl in reversed(range(len(self.chans))):
            ref_fm, tgt_fm = ref_feats[lvl], tgt_feats[lvl]
            lh, lw = ref_fm.shape[1:3]
            if flow is None:
                up_flow = jnp.zeros((b, lh, lw, 2), jnp.float32)
            else:
                up_flow = 2.0 * upsample_2d(flow, lh, lw)
            warped = flow_warp(tgt_fm, up_flow.astype(tgt_fm.dtype))
            corr = correlation2d_volume(ref_fm, warped, self.radius)
            corr = nn.leaky_relu(corr, 0.1)
            flow = FlowEstimator(self.radius, self.hidden, self.batch_norm,
                                 self.dtype)(corr, ref_fm, up_flow, train)
            flows.append(flow)

        flow = ContextRefinement(batch_norm=self.batch_norm,
                                 dtype=self.dtype)(ref_feats[0], flow, train)
        stride = 2 ** 1  # finest pyramid level
        full = stride * upsample_2d(flow, h, w)
        return {"flows": [full] + flows[::-1]}


def _build_pwcflow(cfg):
    m = cfg["model"]
    return PWCFlow(
        chans=tuple(m.get("chans", (16, 32, 64, 96))),
        radius=m.get("radius", 4),
        hidden=m.get("hidden", 96),
        batch_norm=m.get("batch_norm", True),
        dtype=jnp.dtype(m.get("dtype", "float32")),
    )


def _build_raft(cfg):
    from .raft import RAFTFlow
    m = cfg["model"]
    return RAFTFlow(
        iters=m.get("iters", 8),
        radius=m.get("radius", 3),
        levels=m.get("levels", 4),
        hidden=m.get("hidden", 96),
        context=m.get("context", 64),
        batch_norm=m.get("batch_norm", True),
        dtype=jnp.dtype(m.get("dtype", "float32")),
    )


FLOW_META_ARCHITECTURES = {
    "PWCFlow": _build_pwcflow,
    "RAFTFlow": _build_raft,
}


def build_flow_model(cfg):
    arch = cfg["model"]["meta_architecture"]
    if arch not in FLOW_META_ARCHITECTURES:
        raise ValueError(
            f"no flow meta-architecture registered for '{arch}' "
            f"(available: {sorted(FLOW_META_ARCHITECTURES)})")
    return FLOW_META_ARCHITECTURES[arch](cfg)
