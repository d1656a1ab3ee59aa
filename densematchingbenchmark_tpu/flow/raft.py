"""RAFT-style recurrent all-pairs flow (second flow family).

No reference parity target: the reference registers ZERO flow models
(dmb/modeling/flow/models/__init__.py:2-4); this extends the flow zoo
beyond PWCFlow with the recurrent-refinement family (RAFT: Teed & Deng,
ECCV 2020), re-designed TPU-first:

- the all-pairs correlation volume is one [B*h*w, C] x [B*h*w, C] batched
  matmul (MXU) pooled into a 4-level pyramid over the target dims;
- the per-iteration correlation lookup is two chained 1-D linear gathers
  (ops/warp.gather_1d_linear) — bounded data-dependent gathers, the same
  pattern the stereo warps use;
- the update operator is a ConvGRU iterated under `lax.scan` with static
  iteration count (weights shared across iterations — one trace, one
  compile, no Python unrolling);
- the learned convex 8x upsampler is a conv + softmax over the 9-tap
  neighborhood combined in phase layout (the GCNet phase-head idiom):
  the [B, 8h, 8w] flow is assembled by one small pixel shuffle.

Channels-last throughout; displacement/lookup axes sit in lanes.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import ConvUnit
from ..ops.warp import gather_1d_linear
from ..ops.interpolate import upsample_2d


class ResUnit(nn.Module):
    features: int
    stride: int = 1
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvUnit(self.features, stride=self.stride,
                     batch_norm=self.batch_norm, dtype=self.dtype)(x, train)
        y = ConvUnit(self.features, batch_norm=self.batch_norm, relu=False,
                     dtype=self.dtype)(y, train)
        if x.shape[-1] != self.features or self.stride != 1:
            x = ConvUnit(self.features, kernel_size=1, stride=self.stride,
                         padding=0, batch_norm=self.batch_norm, relu=False,
                         dtype=self.dtype)(x, train)
        return nn.relu(x + y)


class RaftEncoder(nn.Module):
    """Stride-8 residual encoder (feature or context head)."""
    chans: Sequence[int] = (32, 64, 96)
    out_features: int = 128
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvUnit(self.chans[0], kernel_size=7, stride=2, padding=3,
                     batch_norm=self.batch_norm, dtype=self.dtype)(x, train)
        for c in self.chans:
            stride = 1 if c == self.chans[0] else 2
            x = ResUnit(c, stride, self.batch_norm, self.dtype)(x, train)
            x = ResUnit(c, 1, self.batch_norm, self.dtype)(x, train)
        return ConvUnit(self.out_features, kernel_size=1, padding=0,
                        batch_norm=False, relu=False, dtype=self.dtype)(
                            x, train)


def all_pairs_corr_pyramid(fm1, fm2, levels=4):
    """[B,h,w,C] x [B,h,w,C] -> [corr_l: [B, h, w, h/2^l, w/2^l]] pyramid.

    One batched matmul on the MXU; target-dim average pooling per level.
    Scores are normalized by sqrt(C) (RAFT convention).
    """
    b, h, w, c = fm1.shape
    a = fm1.reshape(b, h * w, c).astype(jnp.float32)
    t = fm2.reshape(b, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("bnc,bmc->bnm", a, t) / jnp.sqrt(float(c))
    corr = corr.reshape(b, h, w, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        ch, cw = pyramid[-1].shape[3:5]
        ch2, cw2 = ch // 2, cw // 2
        if ch2 == 0 or cw2 == 0:
            break  # target dims exhausted (tiny inputs)
        # floor-pool: crop odd trailing row/col first (torch avg_pool2d
        # kernel-2/stride-2 semantics)
        p = pyramid[-1][:, :, :, :2 * ch2, :2 * cw2]
        p = p.reshape(b, h, w, ch2, 2, cw2, 2)
        pyramid.append(jnp.mean(p, axis=(4, 6)))
    return pyramid


def _tent_weights(coords, size):
    """[..., k] fractional coords -> [..., k, size] bilinear tap weights.

    w[..., i, c] = max(0, 1 - |coords[..., i] - c|): the two integer taps
    of linear interpolation as a dense "two-hot" row, with out-of-range
    taps contributing 0 (zero-padding semantics — a coordinate outside
    [0, size-1] keeps only the weight of its in-range tap, exactly what
    gather_1d_linear's validity mask produces)."""
    cells = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - cells))


def corr_lookup(pyramid, coords, radius=3):
    """Sample each pyramid level in a (2r+1)^2 window around the current
    correspondence estimate; returns [B, h, w, levels*(2r+1)^2].

    TPU-first schedule (round 5): separable bilinear sampling is computed
    as two tent-weight CONTRACTIONS per level —
        t[n,i,:]  = sum_ch  Wy[n,i,ch] * corr[n,ch,:]     (rows)
        out[n,i,j] = sum_cw t[n,i,cw]  * Wx[n,j,cw]       (columns)
    where Wy/Wx are the dense two-hot bilinear rows from _tent_weights.
    This replaces the original chained take_along_axis gathers, whose
    XLA:TPU lowering was scalar (T(1024)-tiled [N,7,7] fusions at ~187 ms
    of RAFT's 247 ms forward, xplane r5); the contractions stream on the
    MXU instead. Same idiom as DeepPruner's PatchMatch tent-window scoring
    (ops/patch_match.py). A/B + parity: tests/flow/test_raft.py,
    DESIGN.md §9.
    """
    b, h, w = coords.shape[:3]
    n = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    feats = []
    for lvl, corr in enumerate(pyramid):
        ch, cw = corr.shape[3:5]
        scale = 0.5 ** lvl
        N = b * h * w
        cy = coords[..., 1].reshape(N) * scale
        cx = coords[..., 0].reshape(N) * scale
        wy = _tent_weights(cy[:, None] + offs, ch)        # [N,n,ch]
        wx = _tent_weights(cx[:, None] + offs, cw)        # [N,n,cw]
        src = corr.reshape(N, ch, cw)
        t = jnp.einsum("nic,ncw->niw", wy, src,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("niw,njw->nij", t, wx,
                         preferred_element_type=jnp.float32)
        feats.append(out.reshape(b, h, w, n * n))
    return jnp.concatenate(feats, axis=-1)


def corr_lookup_gather(pyramid, coords, radius=3):
    """Reference lowering of corr_lookup via chained 1-D linear gathers
    (ops/warp.gather_1d_linear). Kept as the parity oracle for the
    tent-contraction fast path; not used in the forward."""
    b, h, w = coords.shape[:3]
    n = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    feats = []
    for lvl, corr in enumerate(pyramid):
        ch, cw = corr.shape[3:5]
        scale = 0.5 ** lvl
        cy = coords[..., 1] * scale                      # [B,h,w]
        cx = coords[..., 0] * scale
        # flatten source pixels; gather target rows then columns
        src = corr.reshape(b * h * w, ch, cw, 1)
        ys = cy.reshape(b * h * w, 1, 1) + offs[None, :, None]    # [N,n,1]
        g = gather_1d_linear(src, ys[..., None], axis=1)          # [N,n,cw,1]
        xs = cx.reshape(b * h * w, 1, 1) + offs[None, None, :]    # [N,1,n]
        g = gather_1d_linear(g, jnp.broadcast_to(
            xs[..., None], (b * h * w, n, n, 1)), axis=2)         # [N,n,n,1]
        feats.append(g.reshape(b, h, w, n * n))
    return jnp.concatenate(feats, axis=-1)


class ConvGRU(nn.Module):
    hidden: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        conv = lambda name: ConvUnit(self.hidden, batch_norm=False,
                                     relu=False, dtype=self.dtype,
                                     name=name)
        z = nn.sigmoid(conv("z")(hx))
        r = nn.sigmoid(conv("r")(hx))
        q = nn.tanh(conv("q")(jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class MotionEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr_feat, flow):
        c = ConvUnit(96, kernel_size=1, padding=0, batch_norm=False,
                     dtype=self.dtype)(corr_feat)
        c = ConvUnit(64, batch_norm=False, dtype=self.dtype)(c)
        f = ConvUnit(32, kernel_size=7, padding=3, batch_norm=False,
                     dtype=self.dtype)(flow.astype(c.dtype))
        f = ConvUnit(16, batch_norm=False, dtype=self.dtype)(f)
        out = ConvUnit(80, batch_norm=False, dtype=self.dtype)(
            jnp.concatenate([c, f], axis=-1))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class ConvexUpsampler(nn.Module):
    """Learned 8x upsampling: per-output-pixel softmax over the 3x3 coarse
    neighborhood, assembled in phase layout (64 spatial phases in lanes;
    one tiny pixel shuffle at the end — the GCNet phase-head idiom)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, flow):
        b, h, w, _ = flow.shape
        m = ConvUnit(128, batch_norm=False, dtype=self.dtype)(hidden)
        mask = ConvUnit(64 * 9, kernel_size=1, padding=0, batch_norm=False,
                        relu=False, dtype=self.dtype)(m)
        mask = jax.nn.softmax(
            mask.reshape(b, h, w, 64, 9).astype(jnp.float32), axis=-1)
        # 9 shifted coarse-flow taps [B,h,w,9,2]: zero-pad + slice (ADVICE
        # r4 — canonical RAFT's F.unfold zero-pads; jnp.roll would wrap
        # flow from the opposite image edge into border pixels)
        padded = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [padded[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        nb = jnp.stack(taps, axis=3)                      # [B,h,w,9,2]
        up = jnp.einsum("bhwpk,bhwkc->bhwpc", mask, nb) * 8.0
        up = up.reshape(b, h, w, 8, 8, 2)
        up = jnp.transpose(up, (0, 1, 3, 2, 4, 5))
        return up.reshape(b, 8 * h, 8 * w, 2)


class UpdateBlock(nn.Module):
    """One RAFT iteration: lookup -> motion encoder -> ConvGRU -> Δflow.

    Scanned with nn.scan (params broadcast across iterations = RAFT's
    weight-tied update operator). No BatchNorm inside (no mutable state
    under scan)."""
    hidden: int = 96
    radius: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, invariants):
        hid, flow = carry
        pyramid, context, base = invariants
        corr_feat = corr_lookup(pyramid, base + flow, self.radius)
        x = jnp.concatenate(
            [MotionEncoder(dtype=self.dtype)(
                corr_feat.astype(self.dtype), flow),
             context.astype(self.dtype)], axis=-1)
        hid = ConvGRU(self.hidden, dtype=self.dtype)(
            hid.astype(self.dtype), x).astype(jnp.float32)
        delta = ConvUnit(2, batch_norm=False, relu=False, dtype=self.dtype,
                         name="flow_head2")(
            ConvUnit(128, batch_norm=False, dtype=self.dtype,
                     name="flow_head1")(hid.astype(self.dtype)))
        flow = flow + delta.astype(jnp.float32)
        return (hid, flow), flow


class RAFTFlow(nn.Module):
    """Recurrent all-pairs field transform for optical flow.

    Returns {'flows': [...]}: best-first — the convex-upsampled final
    flow, then each iteration's bilinearly-upsampled flow latest-first
    (the sequence-loss targets, flow/losses.flow_l1_loss with the
    gamma-decayed weights from the config).
    """
    iters: int = 8
    radius: int = 3
    levels: int = 4
    hidden: int = 96
    context: int = 64
    batch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_img, tgt_img, train: bool = False):
        b, h, w, _ = ref_img.shape
        fh, fw = h // 8, w // 8
        fnet = RaftEncoder(out_features=128, batch_norm=self.batch_norm,
                           dtype=self.dtype, name="fnet")
        fm1 = fnet(ref_img.astype(self.dtype), train)
        fm2 = fnet(tgt_img.astype(self.dtype), train)
        cnet = RaftEncoder(out_features=self.hidden + self.context,
                           batch_norm=self.batch_norm, dtype=self.dtype,
                           name="cnet")(ref_img.astype(self.dtype), train)
        hidden = nn.tanh(cnet[..., :self.hidden].astype(jnp.float32))
        context = nn.relu(cnet[..., self.hidden:])

        pyramid = all_pairs_corr_pyramid(fm1, fm2, self.levels)
        base = jnp.stack(jnp.meshgrid(
            jnp.arange(fw, dtype=jnp.float32),
            jnp.arange(fh, dtype=jnp.float32)), axis=-1)[None]  # [1,fh,fw,2]

        ScannedUpdate = nn.scan(
            UpdateBlock,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.iters)
        zero_flow = jnp.zeros((b, fh, fw, 2), jnp.float32)
        (hidden, flow), iter_flows = ScannedUpdate(
            self.hidden, self.radius, self.dtype, name="update")(
                (hidden, zero_flow), (pyramid, context, base))

        up_full = ConvexUpsampler(dtype=self.dtype)(
            hidden.astype(self.dtype), flow)
        # per-iteration bilinear upsamples, latest (best) first
        seq = [8.0 * upsample_2d(iter_flows[i], h, w)
               for i in reversed(range(self.iters))]
        return {"flows": [up_full] + seq}
