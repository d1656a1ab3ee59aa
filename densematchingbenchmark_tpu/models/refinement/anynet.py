"""AnyNet SPN disparity refinement (TPU-native gate-recurrent scan).

Parity target: dmb/modeling/stereo/disp_refinement/AnyNet.py:8-96 — gate
maps from the downsampled left image (normalized so |G1|+|G2|+|G3| <= 1),
disparity features propagated left->right by the gated 2-D scan
(ops/spn.py replaces the reference's CUDA GateRecurrent2dnoind), residual
classify, ReLU clamp.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..layers import conv_bn_relu
from ...ops.interpolate import upsample_2d
from ...ops.spn import gate_recurrent_2d, normalize_gates


class AnyNetRefinement(nn.Module):
    spn_planes: int = 8
    batch_norm: bool = True
    dtype: Any = jnp.float32
    # pack > 1: run the 16-channel gate-conv stack row-packed
    # [B, H/pack, W, pack*C] (same measured-win schedule as StereoNet's
    # refinement trunk, DESIGN.md §6). The scan itself stays unpacked (the
    # recurrence is along W).
    pack: int = 0

    @nn.compact
    def __call__(self, disps, ref_fms, tgt_fms, left_image, right_image,
                 train: bool = False):
        from ...ops.conv3d import pack_rows2d, unpack_rows2d
        bn, dt, sp = self.batch_norm, self.dtype, self.spn_planes
        init_disp = disps[-1]
        h, w = init_disp.shape[1:3]
        img = upsample_2d(left_image, h, w, align_corners=False)

        pk = self.pack if self.pack and self.pack > 1 else 1
        if h % pk:
            pk = 1
        g = img.astype(dt)
        if pk > 1:
            g = pack_rows2d(g, pk)
        for _ in range(3):
            g = conv_bn_relu(bn, sp * 2, 3, 1, 1, bias=False, dtype=dt,
                             pack=pk)(g, train)
        if pk > 1:
            g = unpack_rows2d(g, pk)
        g = nn.Conv(sp * 3, (3, 3), padding=1, use_bias=False, dtype=dt,
                    param_dtype=jnp.float32)(g)
        g1, g2, g3 = jnp.split(g.astype(jnp.float32), 3, axis=-1)
        g1, g2, g3 = normalize_gates(g1, g2, g3)

        disp_feat = nn.Conv(sp, (3, 3), padding=1, use_bias=False, dtype=dt,
                            param_dtype=jnp.float32)(init_disp.astype(dt))
        propagated = gate_recurrent_2d(disp_feat.astype(jnp.float32),
                                       g1, g2, g3,
                                       horizontal=True, reverse=False)
        res = nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=dt,
                      param_dtype=jnp.float32)(propagated.astype(dt))
        refined = nn.relu(res.astype(jnp.float32) + init_disp)
        return [refined] + list(disps)[::-1]  # best first
