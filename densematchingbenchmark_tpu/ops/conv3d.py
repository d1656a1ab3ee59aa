"""3-D convolution decomposed for the TPU MXU ("tapped" conv3d).

XLA:TPU lowers a direct NDHWC conv3d to matmuls whose output-lane dim is
Cout (32 for most of the cost-aggregation trunks here, reference
dmb/modeling/stereo/cost_processors/aggregators/*), wasting 3/4 of the
128-wide MXU. This module rewrites

    y[b,do,ho,wo,o] = sum_{td,th,tw,i} x[b, do*sd-pd+td*dd, ...] * K[td,th,tw,i,o]

as ONE 2-D convolution over (H, W) applied to the [B*D, H, W, C] view with
the kd depth-taps merged into the output-channel axis (lanes: Cout ->
kd*Cout, e.g. 32 -> 96), followed by a cheap strided 3-term shifted add
along D. The math is identical (same contraction, reassociated), so the
XLA path remains available for parity testing; `set_impl()` / the
DMB_CONV3D_IMPL env var pick the implementation globally.

The transposed variant does the same with an (H, W) input-dilated conv and
a static scatter-add interleave along D, matching ConvTransposeExact's
torch ConvTranspose3d shape semantics (out = (in-1)*s - 2p + k + op,
kernel not flipped).

Measured on v5e (PSMNet 384x1248 b1 bench): tapped 11.9 FPS vs direct XLA
conv3d 15.3 FPS — the [B,D,Ho,Wo,kd*Cout] tap intermediate is kd x the
output bytes, so the schedule is HBM-bound and loses despite the wider
lanes. Default is therefore 'xla'; 'tapped' stays as a parity-tested
library schedule (useful where D is sharded: the 2-D conv needs no D-halo).

A second rewrite, `conv3d_dpack2` ("dpack"), packs D-parity pairs into
channels instead: the [B,D,H,W,C] volume becomes [B,D/2,H,W,2C] and the
kd=3 depth contraction becomes a 50%-block-sparse [3,kh,kw,2Ci,2Co]
channel contraction. Per-op v5e measurements motivating it: XLA runs
64->64 conv3d at ~137 TF/s but 32->32 at ~16 TF/s and 64->32 at ~17 TF/s
(output lanes < 128 starve the MXU) — so doubling both channel axes at 2x
the MAC count is a large net win for every stride-1(D) conv in the
PSM/Acf/GC/DeepPruner aggregation trunks.
"""

import os

import jax.numpy as jnp
from jax import lax

_IMPL = os.environ.get("DMB_CONV3D_IMPL", "xla")

# Packed-schedule selection (conv3d_packed dispatch), read ONCE at import
# like _IMPL; override via set_packed_schedules() (or the env vars before
# import). 'classify': 'hq' routes Co=1 k3/s1/p1 heads to the H-opacked
# form, 'win3' forces the plain window-3 packed conv. 's1': 'auto' routes
# stride-1 convs with Ci >= 2*Co to the halo form, 'hpack'/'win3' force
# one schedule (A/B testing).
_PACKED_CLASSIFY = os.environ.get("DMB_PACKED_CLASSIFY", "hq")
_PACKED_S1 = os.environ.get("DMB_PACKED_S1", "auto")


def set_impl(name: str):
    """Global conv3d implementation: 'auto', 'xla', 'tapped' or 'dpack'."""
    global _IMPL
    assert name in ("auto", "tapped", "xla", "dpack"), name
    _IMPL = name


def get_impl() -> str:
    return _IMPL


def set_packed_schedules(classify=None, s1=None):
    """Select conv3d_packed sub-schedules (see module docstring).

    s1='pallas' routes eligible stride-1 convs (k3/p1/d1, Co>1, even pack,
    H % 8 == 0, accelerator backend) through the true-MAC Pallas kernel
    (ops/pallas/packed_conv3d_kernel.py); ineligible shapes fall back to
    the XLA auto dispatch.
    """
    global _PACKED_CLASSIFY, _PACKED_S1
    if classify is not None:
        assert classify in ("hq", "win3", "te"), classify
        _PACKED_CLASSIFY = classify
    if s1 is not None:
        assert s1 in ("auto", "hpack", "win3", "pallas", "shalo"), s1
        _PACKED_S1 = s1


def get_packed_schedules():
    return {"classify": _PACKED_CLASSIFY, "s1": _PACKED_S1}


def packed_pallas_eligible(x_shape, kernel_shape, strides, padding,
                           dilation, pack):
    """True when the packed stride-1 conv routes to the Pallas true-MAC
    kernel (opt-in via set_packed_schedules(s1='pallas'); accelerator
    backend; k3/s1/p1/d1; Co>1; even pack; H divisible by the tile)."""
    if _PACKED_S1 != "pallas":
        return False
    kd, kh, kw, ci, co = kernel_shape
    if not (strides == (1, 1, 1) and padding == (1, 1, 1)
            and dilation == (1, 1, 1) and (kd, kh, kw) == (3, 3, 3)
            and co > 1 and pack % 2 == 0 and x_shape[2] % 8 == 0):
        return False
    import jax
    return jax.default_backend() != "cpu"


def use_tapped() -> bool:
    return _IMPL == "tapped"


def use_custom() -> bool:
    """True when ConvUnit should route conv3d through conv3d_apply."""
    return _IMPL != "xla"


def dpack2_applicable(d, kernel_shape, strides, padding, dilation) -> bool:
    """dpack2 preconditions: kd=3, unit D-stride/dilation, pd=1, even D."""
    return (kernel_shape[0] == 3 and strides[0] == 1 and padding[0] == 1
            and dilation[0] == 1 and d % 2 == 0)


def _dpack_blocks(pack):
    """Valid (tap_index tj+1, input slot p, output slot q, depth tap td).

    From x depth index P*(j+tj)+p == output depth P*j+q shifted by td-1:
    td = P*tj + p - q + 1, kept when td lands in {0,1,2}.
    """
    blocks = []
    for tj in (-1, 0, 1):
        for p in range(pack):
            for q in range(pack):
                td = pack * tj + p - q + 1
                if 0 <= td <= 2:
                    blocks.append((tj + 1, p, q, td))
    return tuple(blocks)


def dpack_kernel(kernel, pack):
    """[3,kh,kw,Ci,Co] -> block-sparse packed [3,kh,kw,P*Ci,P*Co] kernel.

    Built with jnp ops from the live parameter so gradients route back to
    the true weights; the zero blocks receive (and contribute) nothing.
    """
    kd, kh, kw, ci, co = kernel.shape
    kp = jnp.zeros((3, kh, kw, pack * ci, pack * co), kernel.dtype)
    for tj, p, q, td in _dpack_blocks(pack):
        kp = kp.at[tj, :, :, p * ci:(p + 1) * ci,
                   q * co:(q + 1) * co].set(kernel[td])
    return kp


def conv3d_dpack(x, kernel, strides=(1, 1, 1), padding=(1, 1, 1),
                 dilation=(1, 1, 1), pack=4):
    """conv3d with `pack` consecutive D slices packed into channels.

    Requires dpack2_applicable(...) plus D % pack == 0. H/W
    stride/padding/dilation are free (they pass through to the packed
    conv unchanged). Semantics == lax.conv_general_dilated with symmetric
    per-axis padding; the depth-boundary zero padding is provided by the
    packed tap padding of 1 (each packed pad tap supplies `pack` zero
    slices; only x[-1] and x[D] are actually referenced).
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    assert d % pack == 0, (d, pack)
    assert dpack2_applicable(d, kernel.shape, strides, padding, dilation), (
        x.shape, kernel.shape, strides, padding, dilation)
    _, sh, sw = strides
    _, ph, pw = padding
    _, dh, dw = dilation

    xp = x.reshape(b, d // pack, pack, h, w, ci)
    xp = jnp.moveaxis(xp, 2, 4).reshape(b, d // pack, h, w, pack * ci)
    kp = dpack_kernel(kernel, pack)
    yp = lax.conv_general_dilated(
        xp, kp, window_strides=(1, sh, sw),
        padding=[(1, 1), (ph, ph), (pw, pw)],
        rhs_dilation=(1, dh, dw),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ho, wo = yp.shape[2], yp.shape[3]
    y = jnp.moveaxis(yp.reshape(b, d // pack, ho, wo, pack, co), 4, 2)
    return y.reshape(b, d, ho, wo, co)


def conv3d_dpack2(x, kernel, strides=(1, 1, 1), padding=(1, 1, 1),
                  dilation=(1, 1, 1)):
    """Pack-2 specialization of conv3d_dpack (kept for the test suite)."""
    return conv3d_dpack(x, kernel, strides, padding, dilation, pack=2)


# ---------------------------------------------------------------------------
# Trunk-packed schedule: the whole 3-D aggregation trunk runs on tensors that
# stay in the packed layout [B, D/P, H, W, P*C] end-to-end (pack once at the
# raw cost volume, unpack only the tiny classify outputs). This removes the
# per-conv relayouts that make DMB_CONV3D_IMPL=dpack lose end-to-end, and
# turns every lane-starved 32-channel conv into a >=128-lane conv. Measured
# per-op on v5e at PSMNet trunk shapes (tools/microbench_conv3d_packed.py,
# P=4, bf16): 32->32 s1 5.8ms -> 3.0ms; 64->32 s1 10.3 -> 6.0; s2 32->64
# 3.4 -> 1.7; deconv 64->32 2.1 -> 1.4; classify 32->1 5.8 -> 3.0.
#
# Index algebra (P = pack, row r = packed depth index, slot p/q in [0,P)):
#   stride-1 conv  (kd=3,pd=1):   window 3, pad (1,1):
#       td = P*(tj-1) + p - q + 1                      (dpack_kernel)
#   stride-2 conv  (kd=3,sd=2,pd=1): window 4, row-stride 2, pad (1,1):
#       td = P*(r_off-1) + p - 2q + 1                  (dpack_kernel_s2)
#   deconv (k3,s2,p1,op1): window 3, lhs_dilation 2, pad (1,2):
#       td = P*(t_hat-1) + 2p - q + 1                  (dpack_kernel_transpose)
# Each mapping keeps exactly the blocks with td in {0,1,2}; zero blocks cost
# MXU MACs but no accuracy — that overhead is what the wider lanes pay for.


def pack_volume(x, pack):
    """[B, D, H, W, C] -> packed [B, D/pack, H, W, pack*C]."""
    b, d, h, w, c = x.shape
    assert d % pack == 0, (d, pack)
    xp = x.reshape(b, d // pack, pack, h, w, c)
    return jnp.moveaxis(xp, 2, 4).reshape(b, d // pack, h, w, pack * c)


def unpack_volume(xp, pack):
    """Packed [B, R, H, W, pack*C] -> [B, R*pack, H, W, C]."""
    b, r, h, w, pc = xp.shape
    assert pc % pack == 0, (pc, pack)
    c = pc // pack
    x = xp.reshape(b, r, h, w, pack, c)
    return jnp.moveaxis(x, 4, 2).reshape(b, r * pack, h, w, c)


def concat_packed(xs, pack):
    """Channel-concat packed volumes, preserving slot-major packed layout.

    pack_volume(concat(a, b)) interleaves channels per depth slot; a plain
    jnp.concatenate of packed tensors would instead produce [a-slots,
    b-slots] ordering that packed kernels don't expect. This reorders via a
    lane shuffle (reshape to [..., P, C], concat, flatten).
    """
    parts = [x.reshape(x.shape[:-1] + (pack, x.shape[-1] // pack))
             for x in xs]
    y = jnp.concatenate(parts, -1)
    return y.reshape(y.shape[:-2] + (y.shape[-2] * y.shape[-1],))


def dpack_kernel_s2(kernel, pack):
    """[3,kh,kw,Ci,Co] -> packed stride-2(D) kernel [4,kh,kw,P*Ci,P*Co].

    Output depth P*jo+q reads input depths 2(P*jo+q)+td-1, which span the
    4 packed rows 2jo-1..2jo+2; apply with window_strides[0]=2 and D-pad
    (1,1). Valid blocks: td = P*(r_off-1) + p - 2q + 1 in {0,1,2}.
    """
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3, kd
    kp = jnp.zeros((4, kh, kw, pack * ci, pack * co), kernel.dtype)
    for r_off in range(4):
        for p in range(pack):
            for q in range(pack):
                td = pack * (r_off - 1) + p - 2 * q + 1
                if 0 <= td <= 2:
                    kp = kp.at[r_off, :, :, p * ci:(p + 1) * ci,
                               q * co:(q + 1) * co].set(kernel[td])
    return kp


def dpack_kernel_transpose(kernel, pack):
    """[3,kh,kw,Ci,Co] -> packed deconv(k3,s2,p1,op1) kernel [3,..,P*,P*].

    Matches ConvTransposeExact semantics (kernel not flipped): unpacked
    out[od] = sum_t x[(od-1+t)/2] K[t]. On packed rows: window 3 with
    lhs_dilation 2 and pad (1,2); block (t_hat, p, q) holds true tap
    t = P*(t_hat-1) + 2p - q + 1 when in {0,1,2}.
    """
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3, kd
    kp = jnp.zeros((3, kh, kw, pack * ci, pack * co), kernel.dtype)
    for th in range(3):
        for p in range(pack):
            for q in range(pack):
                t = pack * (th - 1) + 2 * p - q + 1
                if 0 <= t <= 2:
                    kp = kp.at[th, :, :, p * ci:(p + 1) * ci,
                               q * co:(q + 1) * co].set(kernel[t])
    return kp


def conv3d_packed(xp, kernel, pack, strides=(1, 1, 1), padding=(1, 1, 1),
                  dilation=(1, 1, 1)):
    """conv3d on a PACKED volume [B, R, H, W, P*Ci] -> packed output.

    Supports the PSM-trunk cases: kd=3, pd=1, dd=1, D-stride 1 or 2 (H/W
    stride/padding/dilation are unconstrained). Semantically identical to
    lax.conv_general_dilated on the unpacked volume.

    Per-class schedule dispatch (v5e, tools/microbench_conv3d_packed.py
    --round3): 1-channel classify heads route to the H-opacked form
    (3.0 -> 1.9 ms at the PSMNet trunk shape; lanes P -> hq*P); stride-1
    convs whose input is at least twice the output channel count route to
    the halo form (6.0 -> 4.7 ms for 64->32: its dense-MAC count is
    (P+2)/3 x true instead of P x, which beats the extra halo traffic once
    Ci is large). Overrides: set_packed_schedules(classify=, s1=) — or the
    DMB_PACKED_CLASSIFY / DMB_PACKED_S1 env vars at import time.
    """
    kd, kh, kw, ci, co = kernel.shape
    sd, sh, sw = strides
    pd, ph, pw = padding
    dd, dh, dw = dilation
    assert kd == 3 and pd == 1 and dd == 1 and sd in (1, 2), (
        kernel.shape, strides, padding, dilation)
    assert xp.shape[-1] == pack * ci, (xp.shape, kernel.shape, pack)
    s1_plain = (strides == (1, 1, 1) and padding == (1, 1, 1)
                and dilation == (1, 1, 1) and (kh, kw) == (3, 3))
    if co == 1 and s1_plain and _PACKED_CLASSIFY == "te":
        return conv3d_packed_classify_te(xp, kernel, pack)
    if co == 1 and s1_plain and _PACKED_CLASSIFY != "win3":
        h = xp.shape[2]
        for hq in (32, 16, 8):
            if h % hq == 0:
                return conv3d_packed_classify(xp, kernel, pack, hq)
    if packed_pallas_eligible(xp.shape, kernel.shape, strides, padding,
                              dilation, pack):
        from .pallas.packed_conv3d_kernel import conv3d_packed_s1_pallas
        h = xp.shape[2]
        h_t = 16 if h % 16 == 0 else 8
        return conv3d_packed_s1_pallas(xp, kernel, pack=pack, h_tile=h_t)
    if sd == 1 and _PACKED_S1 == "shalo":
        return conv3d_shalo(xp, kernel, pack, strides, padding, dilation)
    if sd == 1 and (_PACKED_S1 == "hpack"
                    or (_PACKED_S1 == "auto" and ci >= 2 * co)):
        return conv3d_hpack(xp, kernel, pack, strides, padding, dilation)
    if sd == 1:
        kp = dpack_kernel(kernel, pack)
        dpad = (1, 1)
    else:
        assert xp.shape[1] % 2 == 0, xp.shape
        kp = dpack_kernel_s2(kernel, pack)
        dpad = (1, 1)
    return lax.conv_general_dilated(
        xp, kp, window_strides=(sd, sh, sw),
        padding=[dpad, (ph, ph), (pw, pw)], rhs_dilation=(1, dh, dw),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_transpose_packed(xp, kernel, pack):
    """ConvTranspose3d(k=3, s=2, p=1, output_padding=1) on a packed volume.

    [B, R, H, W, P*Ci] -> [B, 2R, 2H', 2W', P*Co] with ConvTransposeExact
    shape semantics per axis (out = 2*in).
    """
    kd, kh, kw, ci, co = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3), kernel.shape
    assert xp.shape[-1] == pack * ci, (xp.shape, kernel.shape, pack)
    kp = dpack_kernel_transpose(kernel, pack)
    return lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1, 1),
        padding=[(1, 2), (1, 2), (1, 2)], lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def halo_widen(xp, pack, ci):
    """Packed [B,R,H,W,P*Ci] -> halo-widened [B,R,H,W,(P+2)*Ci].

    Row r's channels become depth slots P*r-1 .. P*r+P (one halo slot from
    each neighboring packed row; zeros at the volume boundary) so a kd=3
    pd=1 depth contraction needs no D window at all (conv3d_hpack).
    """
    assert xp.shape[-1] == pack * ci, (xp.shape, pack, ci)
    zrow = jnp.zeros_like(xp[:, :1, ..., :ci])
    prev = jnp.concatenate([zrow, xp[:, :-1, ..., (pack - 1) * ci:]], 1)
    nxt = jnp.concatenate([xp[:, 1:, ..., :ci], zrow], 1)
    return jnp.concatenate([prev, xp, nxt], -1)


def hpack_kernel(kernel, pack):
    """[3,kh,kw,Ci,Co] -> halo-packed 2-D kernel [kh,kw,(P+2)*Ci,P*Co].

    Output slot q takes taps td in {0,1,2} from halo slot q+td (halo index
    h = true slot + 1). Density 3/(P+2): the dense contraction does
    (P+2)/3 x the true MACs — 2x at P=4, versus 4x for the window-3
    dpack_kernel form, at the same P*Co output lanes.
    """
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3, kd
    kp = jnp.zeros((kh, kw, (pack + 2) * ci, pack * co), kernel.dtype)
    for q in range(pack):
        for td in range(3):
            h = q + td
            kp = kp.at[:, :, h * ci:(h + 1) * ci,
                       q * co:(q + 1) * co].set(kernel[td])
    return kp


def shalo_kernels(kernel, pack):
    """[3,kh,kw,Ci,Co] -> (K_main, K_prev, K_next) split-halo kernels.

    The depth-tap block algebra (td = P*tj + p - q + 1, dpack_kernel): for
    ANY pack P, the same-row term (tj=0) is the only one with multiple
    valid blocks, and the cross-row terms each collapse to a SINGLE block:
    prev row (tj=-1) contributes only (p=P-1, q=0, td=0) and next row
    (tj=+1) only (p=0, q=P-1, td=2). So the conv splits into one dense
    [P*Ci -> P*Co] conv on the packed tensor plus two [Ci -> P*Co] convs
    on a channel slice, with the cross-row outputs shifted one packed row.
    Identical dense MACs to hpack_kernel's banded form — but no
    halo-widened (P+2)/P input materialization (the ~40 ms/iter of
    relayout copies the round-5 GCNet xplane attributes to halo assembly
    at 384x1248; tools/microbench_gcnet_c19.py)."""
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3, kd
    km = jnp.zeros((kh, kw, pack * ci, pack * co), kernel.dtype)
    for p in range(pack):
        for q in range(pack):
            td = p - q + 1
            if 0 <= td <= 2:
                km = km.at[:, :, p * ci:(p + 1) * ci,
                           q * co:(q + 1) * co].set(kernel[td])
    kp = jnp.zeros((kh, kw, ci, pack * co), kernel.dtype)
    kp = kp.at[:, :, :, 0:co].set(kernel[0])
    kn = jnp.zeros((kh, kw, ci, pack * co), kernel.dtype)
    kn = kn.at[:, :, :, (pack - 1) * co:].set(kernel[2])
    return km, kp, kn


def conv3d_shalo(xp, kernel, pack, strides=(1, 1, 1), padding=(1, 1, 1),
                 dilation=(1, 1, 1)):
    """Stride-1(D) conv3d on a packed volume, split-halo form.

    Same contract as conv3d_hpack (kd=3, pd=1, dd=1, sd=1); exactly equal
    outputs. Three 2-D convs (dense main + two single-block cross-row
    terms on a Ci channel slice) summed with a one-row shift — the shifted
    adds fuse, and nothing materializes a widened input."""
    kd, kh, kw, ci, co = kernel.shape
    sd, sh, sw = strides
    pd, ph, pw = padding
    dd, dh, dw = dilation
    assert kd == 3 and pd == 1 and dd == 1 and sd == 1, (
        kernel.shape, strides, padding, dilation)
    b, r, h, w, pc = xp.shape
    assert pc == pack * ci, (xp.shape, kernel.shape, pack)
    km, kpv, knx = shalo_kernels(kernel, pack)

    def conv2(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
            rhs_dilation=(dh, dw), dimension_numbers=("NHWC", "HWIO",
                                                      "NHWC"))

    ym = conv2(xp.reshape(b * r, h, w, pc), km)
    ho, wo = ym.shape[1], ym.shape[2]
    ym = ym.reshape(b, r, ho, wo, pack * co)
    yp = conv2(xp[..., (pack - 1) * ci:].reshape(b * r, h, w, ci),
               kpv).reshape(b, r, ho, wo, pack * co)
    yn = conv2(xp[..., :ci].reshape(b * r, h, w, ci),
               knx).reshape(b, r, ho, wo, pack * co)
    zrow = jnp.zeros_like(yp[:, :1])
    return (ym + jnp.concatenate([zrow, yp[:, :-1]], 1)
            + jnp.concatenate([yn[:, 1:], zrow], 1))


def conv3d_hpack(xp, kernel, pack, strides=(1, 1, 1), padding=(1, 1, 1),
                 dilation=(1, 1, 1)):
    """Stride-1(D) conv3d on a packed volume via halo widening + 2-D conv.

    Same contract as conv3d_packed with sd == 1 (kd=3, pd=1, dd=1), but the
    depth taps are folded into the input channel axis: the packed rows are
    halo-widened to (P+2)*Ci channels and ONE 2-D conv over (H, W) applies
    the banded [kh,kw,(P+2)Ci,P*Co] kernel. Halves the dense-MAC overhead
    of the window-3 packed form (2x true MACs instead of 4x) at identical
    output lanes; costs one extra (P+2)/P-sized input materialization.
    """
    kd, kh, kw, ci, co = kernel.shape
    sd, sh, sw = strides
    pd, ph, pw = padding
    dd, dh, dw = dilation
    assert kd == 3 and pd == 1 and dd == 1 and sd == 1, (
        kernel.shape, strides, padding, dilation)
    b, r, h, w, pc = xp.shape
    assert pc == pack * ci, (xp.shape, kernel.shape, pack)
    xh = halo_widen(xp, pack, ci).reshape(b * r, h, w, (pack + 2) * ci)
    kp = hpack_kernel(kernel, pack)
    y2 = lax.conv_general_dilated(
        xh, kp, window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dh, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y2.reshape(b, r, y2.shape[1], y2.shape[2], pack * co)


def classify_kernel(kernel, pack, hq):
    """[3,kh,kw,Ci,1] -> D-packed + H-opacked kernel for 1-channel heads.

    Returns [3, hq+2, kw, P*Ci, hq*P]: the D axis uses the dpack block
    mapping (window 3 over packed rows), and `hq` consecutive H outputs are
    folded into output channels (H window hq+2, H stride hq) so the output
    lane count becomes hq*P instead of P. MAC overhead is huge relative to
    the (tiny) true op, but the head is HBM-bound: full lanes get it near
    the bandwidth floor instead of the 3 ms the 4-lane form costs on v5e.
    """
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3 and kh == 3 and co == 1, kernel.shape
    kdp = dpack_kernel(kernel, pack)  # [3, 3, kw, P*Ci, P]
    kp = jnp.zeros((3, hq + 2, kw, pack * ci, hq, pack), kernel.dtype)
    for qh in range(hq):
        kp = kp.at[:, qh:qh + 3, :, :, qh, :].set(kdp)
    return kp.reshape(3, hq + 2, kw, pack * ci, hq * pack)


def conv3d_packed_classify(xp, kernel, pack, hq):
    """Classify-head conv (Co=1, k3/s1/p1) on a packed volume, H-opacked.

    xp: [B, R, H, W, P*Ci] with H % hq == 0. Returns the packed-layout
    output [B, R, H, W, P] (== conv3d_packed(xp, kernel, pack) exactly).
    """
    b, r, h, w, pc = xp.shape
    kd, kh, kw, ci, co = kernel.shape
    assert co == 1 and pc == pack * ci and h % hq == 0, (
        xp.shape, kernel.shape, pack, hq)
    kp = classify_kernel(kernel, pack, hq)
    yp = lax.conv_general_dilated(
        xp, kp, window_strides=(1, hq, 1),
        padding=[(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # [B, R, H/hq, W, hq*P] -> [B, R, H, W, P]
    y = yp.reshape(b, r, h // hq, w, hq, pack)
    y = jnp.moveaxis(y, 4, 3)  # [B, R, H/hq, hq, W, P]
    return y.reshape(b, r, h, w, pack)


def classify_kernel_halo(kernel, pack, hq):
    """[3,3,kw,Ci,1] -> halo-D + H-opack classify kernel.

    Returns [hq+2, kw, (P+2)*Ci, hq*P] for a 2-D conv over the halo-widened
    volume: D taps via the halo band (hpack_kernel), hq H outputs folded
    into lanes. Dense-MAC cost is half of classify_kernel's window-3 form.
    """
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3 and kh == 3 and co == 1, kernel.shape
    khp = hpack_kernel(kernel, pack)  # [3, kw, (P+2)*Ci, P]
    kp = jnp.zeros((hq + 2, kw, (pack + 2) * ci, hq, pack), kernel.dtype)
    for qh in range(hq):
        kp = kp.at[qh:qh + 3, :, :, qh, :].set(khp)
    return kp.reshape(hq + 2, kw, (pack + 2) * ci, hq * pack)


def conv3d_hpack_classify(xp, kernel, pack, hq):
    """conv3d_packed_classify with the D taps folded via halo widening.

    Exactly == conv3d_packed(xp, kernel, pack) for Co=1 k3/s1/p1 heads;
    one 2-D conv [B*R, H, W, (P+2)Ci] -> [B*R, H/hq, W, hq*P].

    Bench-only candidate schedule: NOT dispatched by conv3d_packed (the
    round-3 v5e numbers favored conv3d_packed_classify); kept for
    tools/microbench_conv3d_packed.py A/B runs and parity-tested.
    """
    b, r, h, w, pc = xp.shape
    kd, kh, kw, ci, co = kernel.shape
    assert co == 1 and pc == pack * ci and h % hq == 0, (
        xp.shape, kernel.shape, pack, hq)
    xh = halo_widen(xp, pack, ci).reshape(b * r, h, w, (pack + 2) * ci)
    kp = classify_kernel_halo(kernel, pack, hq)
    y2 = lax.conv_general_dilated(
        xh, kp, window_strides=(hq, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y2.reshape(b, r, h // hq, w, hq, pack)
    y = jnp.moveaxis(y, 4, 3)
    return y.reshape(b, r, h, w, pack)


def te_classify_kernel(kernel, pack):
    """[3,3,3,Ci,1] -> [1,1,(P+2)*Ci, 9*P] tap-expansion classify kernel.

    Depth taps fold into the halo-widened K axis (halo slot q+td for
    output slot q, like hpack_kernel); the NINE spatial taps fold into
    output lanes, lifting N from P (4) to 9P (36) — the classify head's
    MXU N-utilization problem — at TRUE MACs (no dense-overlap overhead).
    A 9-term shifted-add epilogue (conv3d_packed_classify_te) re-aligns
    the taps spatially.
    """
    kd, kh, kw, ci, co = kernel.shape
    assert (kd, kh, kw, co) == (3, 3, 3, 1), kernel.shape
    kp = jnp.zeros(((pack + 2) * ci, 9, pack), kernel.dtype)
    for td in range(3):
        for q in range(pack):
            hslot = q + td
            for th in range(3):
                for tw in range(3):
                    kp = kp.at[hslot * ci:(hslot + 1) * ci,
                               th * 3 + tw, q].add(kernel[td, th, tw, :, 0])
    return kp.reshape(1, 1, (pack + 2) * ci, 9 * pack)


def _shift_hw(x, oh, ow):
    """out[..., h, w, :] = x[..., h+oh, w+ow, :], zero outside (x 5-D)."""
    b, r, h, w, p = x.shape
    pad = ((0, 0), (0, 0), (max(-oh, 0), max(oh, 0)),
           (max(-ow, 0), max(ow, 0)), (0, 0))
    xpad = jnp.pad(x, pad)
    h0, w0 = max(-oh, 0) + oh, max(-ow, 0) + ow
    return xpad[:, :, h0:h0 + h, w0:w0 + w, :]


def conv3d_packed_classify_te(xp, kernel, pack):
    """Tap-expansion classify head: one true-MAC 1x1 conv + 9 shifted adds.

    Exactly == conv3d_packed(xp, kernel, pack) for Co=1 k3/s1/p1 heads up
    to float reassociation (the 9 tap partial sums are rounded to the
    compute dtype before the epilogue adds; the windowed forms accumulate
    all 81 taps in the MXU's f32 accumulator).
    """
    b, r, h, w, pc = xp.shape
    kd, kh, kw, ci, co = kernel.shape
    assert co == 1 and pc == pack * ci, (xp.shape, kernel.shape, pack)
    xh = halo_widen(xp, pack, ci).reshape(b * r, h, w, (pack + 2) * ci)
    kp = te_classify_kernel(kernel, pack)
    s = lax.conv_general_dilated(
        xh, kp, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s = s.reshape(b, r, h, w, 9, pack)
    out = s[..., 4, :]  # center tap (th=1, tw=1): shift (0, 0)
    for th in range(3):
        for tw in range(3):
            if (th, tw) == (1, 1):
                continue
            out = out + _shift_hw(s[..., th * 3 + tw, :], th - 1, tw - 1)
    return out


def conv3d_transpose_c1_phase(x, kernel):
    """ConvTranspose3d(1->1, k=8, s=4, p=2, op=0) as a 64-phase conv.

    AcfNet's learned 4x cost upsampler (reference aggregators/AcfNet.py:56-58
    deconv1..3) applied to [B, D, H, W, 1] via lhs-dilation is pathological
    on TPU: the [B, 4D, 4H, 4W, 1] output's C=1 minor dim gets padded to the
    (8,128) tile -> a 256x HBM blowup (measured: a 184 MB bf16 volume
    allocated 47 GB at 384x1248), plus a 1-wide MXU contraction. This
    lowering computes the 64 output phases (out = 4*in per axis; each phase
    is a 2-tap-per-axis subset of the 8^3 kernel) as ONE [3,3,3,1,64] conv
    with 64 output lanes, then interleaves phases into [B, 4D, 4H, 4W]
    (4-D output: no 1-channel minor dim anywhere).

    Semantics == ConvTransposeExact (unflipped kernel, lhs_dilation=4,
    pad (5,5)): out[4j+r] = sum_w x[j-1+w] K[4(w-1) + 5 - r], taps kept
    when in [0, 8). Returns [B, 4D, 4H, 4W].
    """
    assert kernel.shape[-2:] == (1, 1) and kernel.shape[:3] == (8, 8, 8), (
        kernel.shape)
    if x.ndim == 5:
        assert x.shape[-1] == 1, x.shape
        x = x[..., 0]
    b, d, h, w = x.shape
    k3 = kernel[..., 0, 0]  # [8,8,8]

    # per-axis tap index t[w_off, r] = 4*(w_off-1) + 5 - r, masked to [0,8)
    w_off = jnp.arange(3)[:, None]
    r = jnp.arange(4)[None, :]
    t = 4 * (w_off - 1) + 5 - r                     # [3,4]
    valid = (t >= 0) & (t < 8)
    t = jnp.clip(t, 0, 7)

    td = t[:, None, None, :, None, None]
    th = t[None, :, None, None, :, None]
    tw = t[None, None, :, None, None, :]
    vd = valid[:, None, None, :, None, None]
    vh = valid[None, :, None, None, :, None]
    vw = valid[None, None, :, None, None, :]
    kp = k3[td, th, tw] * (vd & vh & vw)            # [3,3,3,4,4,4]
    kp = kp.reshape(3, 3, 3, 1, 64).astype(x.dtype)

    yp = lax.conv_general_dilated(
        x[..., None], kp, window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # [B,D,H,W,64]
    y = yp.reshape(b, d, h, w, 4, 4, 4)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
    return y.reshape(b, 4 * d, 4 * h, 4 * w)


def conv3d_transpose_s2_c1_phase(x, kernel):
    """ConvTranspose3d(Ci->1, k=3, s=2, p=1, op=1) as an 8-phase conv.

    GCNet's full-resolution cost head (aggregators/GCNet.py layer 37,
    reference GCNet.py:7-120). The direct lowering leaves the [B, 2D, 2H,
    2W, 1] output with a 1-wide (or pack-wide) minor dim — measured 28
    ms/iter on v5e at 384x1248 (the single most expensive op in GCNet).
    Here the 8 output phases (out = 2*in per axis) are ONE window-2 conv
    with 8 output lanes over the un-dilated input, then a pixel-shuffle
    interleave (4-D output: no 1-channel minor dim anywhere).

    Semantics == ConvTransposeExact's lhs-dilated form (unflipped kernel,
    pad (1,2)): per axis, out[2m] = K[1]·x[m] and
    out[2m+1] = K[0]·x[m] + K[2]·x[m+1] (x[N] := 0).
    Returns [B, 2D, 2H, 2W].
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, kci, co = kernel.shape
    assert (kd, kh, kw, co) == (3, 3, 3, 1) and kci == ci, (
        kernel.shape, x.shape)
    k3 = kernel[..., 0]  # [3,3,3,Ci]
    # per-axis (phase, tap) -> kernel index; -1 = structurally zero
    idx = ((1, -1), (0, 2))
    kp = jnp.zeros((2, 2, 2, ci, 2, 2, 2), kernel.dtype)
    for pd_ in range(2):
        for ph_ in range(2):
            for pw_ in range(2):
                for ad in range(2):
                    kd_ = idx[pd_][ad]
                    if kd_ < 0:
                        continue
                    for ah in range(2):
                        kh_ = idx[ph_][ah]
                        if kh_ < 0:
                            continue
                        for aw in range(2):
                            kw_ = idx[pw_][aw]
                            if kw_ < 0:
                                continue
                            kp = kp.at[ad, ah, aw, :, pd_, ph_, pw_].set(
                                k3[kd_, kh_, kw_])
    kp = kp.reshape(2, 2, 2, ci, 8).astype(x.dtype)
    yp = lax.conv_general_dilated(
        x, kp, window_strides=(1, 1, 1), padding=[(0, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))  # [B,D,H,W,8]
    y = yp.reshape(b, d, h, w, 2, 2, 2)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
    return y.reshape(b, 2 * d, 2 * h, 2 * w)


def conv3d_transpose_s2_c1_phase_form(xp, kernel, pack=1, out_blocks=1):
    """GCNet cost head in PHASE FORM: no pixel shuffle, no full-res volume.

    ConvTranspose3d(Ci->1, k=3, s=2, p=1, op=1) — reference
    aggregators/GCNet.py:7-120 layer 37 — consumed directly from the
    (possibly trunk-packed) input, producing the full-resolution cost in
    phase layout: channel ``r*8 + pd*4 + ph*2 + pw`` of depth block ``q``
    holds output voxel ``(2*(pack*q + r) + pd, 2h + ph, 2w + pw)``.

    Rationale: the direct lowering's [B, 2D, 2H, 2W, 1] output (92M voxels
    at 384x1248) has a 1-wide minor dim (28 ms/iter measured on v5e — the
    most expensive op in GCNet), and the round-3 8-phase+pixel-shuffle
    attempt lost to relayouts (DESIGN.md §7). But the ONLY consumer of the
    volume is the soft-argmin over D (GCNet's losses/predictor touch
    nothing else), and soft-argmin can be evaluated in phase layout
    (ops/soft_argmin.phase_soft_argmin) — so neither the shuffle nor the
    1-lane volume ever needs to exist.

    Args:
      xp: [B, D/pack, H, W, pack*Ci] packed input (pack=1: plain NDHWC).
      kernel: [3, 3, 3, Ci, 1] ConvTransposeExact parameter (unflipped).
      out_blocks: fold this many consecutive output depth BLOCKS into the
        channel axis too — lifts the output lane count from pack*8 to
        out_blocks*pack*8 (the 16-lane pk=2 head measured lane-bound at
        8.2 ms/iter on v5e; out_blocks=4 gives 64 lanes). The widened
        layout equals the out_blocks=1 layout with an effective pack of
        out_blocks*pack, so phase_soft_argmin/phase_cost_to_volume consume
        it unchanged with pack=out_blocks*pack. Dense-MAC overhead grows
        from 2 to (out_blocks+1)/out_blocks*... (window out_blocks+1 vs 2
        taps) — a lanes-vs-MACs trade, A/B'd on chip.

    Returns:
      [B, D/(pack*out_blocks), H, W, out_blocks*pack*8] phase-form cost.
    """
    b, dq, h, w, cp = xp.shape
    ci = cp // pack
    po = out_blocks
    kd, kh, kw, kci, co = kernel.shape
    assert (kd, kh, kw, co) == (3, 3, 3, 1) and kci == ci, (
        kernel.shape, xp.shape)
    assert dq % po == 0, (dq, po)
    k3 = kernel[..., 0]  # [3,3,3,Ci]
    # per-axis (phase, tap) -> kernel index; -1 = structurally zero
    # (out[2m] = K[1]·x[m]; out[2m+1] = K[0]·x[m] + K[2]·x[m+1])
    idx = ((1, -1), (0, 2))
    kp = jnp.zeros((po + 1, 2, 2, pack * ci, po * pack * 8), kernel.dtype)
    for rp in range(po * pack):       # unpacked row within the output tile
        for pd_ in range(2):
            for ad in range(2):       # depth tap
                kd_ = idx[pd_][ad]
                if kd_ < 0:
                    continue
                rin = rp + ad
                adp, rin = rin // pack, rin % pack   # block offset, row
                for ph_ in range(2):
                    for ah in range(2):
                        kh_ = idx[ph_][ah]
                        if kh_ < 0:
                            continue
                        for pw_ in range(2):
                            for aw in range(2):
                                kw_ = idx[pw_][aw]
                                if kw_ < 0:
                                    continue
                                cout = rp * 8 + pd_ * 4 + ph_ * 2 + pw_
                                kp = kp.at[
                                    adp, ah, aw,
                                    rin * ci:(rin + 1) * ci, cout].set(
                                        k3[kd_, kh_, kw_])
    kp = kp.astype(xp.dtype)
    return lax.conv_general_dilated(
        xp, kp, window_strides=(po, 1, 1), padding=[(0, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def phase_cost_to_volume(yp, pack=1):
    """Materialize a phase-form cost (conv3d_transpose_s2_c1_phase_form)
    into the plain [B, 2D, 2H, 2W] volume — for visualization/inspection
    paths (view_cost) only; the hot path never calls this."""
    b, dq, h, w, c = yp.shape
    assert c == pack * 8, (yp.shape, pack)
    y = yp.reshape(b, dq, h, w, pack, 2, 2, 2)
    y = jnp.transpose(y, (0, 1, 4, 5, 2, 6, 3, 7))
    return y.reshape(b, dq * pack * 2, 2 * h, 2 * w)


def conv3d_opack(x, kernel, strides=(1, 1, 1), padding=(1, 1, 1),
                 dilation=(1, 1, 1), pack=4):
    """conv3d with `pack` consecutive OUTPUT D slices packed into channels.

    The kd=3 conv becomes one [pack+2, kh, kw, Ci, pack*Co] conv with
    D-stride `pack`: output block q of the widened channel axis holds
    depth slice P*j+q, fed by original taps td at widened depth tap q+td.
    Unlike conv3d_dpack the input is NOT packed (no relayout on the way
    in), MAC overhead is (pack+2)/3 instead of pack, and the output lane
    count becomes pack*Co — the fix for Cout-starved MXU lanes (measured
    v5e: 64->32 full-volume 1.5x over direct XLA with pack=4).

    Requires kd=3, sd=1, pd=1, dd=1, D % pack == 0.
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    assert d % pack == 0, (d, pack)
    assert dpack2_applicable(d, kernel.shape, strides, padding, dilation), (
        x.shape, kernel.shape, strides, padding, dilation)
    _, sh, sw = strides
    _, ph, pw = padding
    _, dh, dw = dilation

    kp = jnp.zeros((pack + 2, kh, kw, ci, pack * co), kernel.dtype)
    for q in range(pack):
        for td in range(3):
            kp = kp.at[q + td, :, :, :, q * co:(q + 1) * co].set(kernel[td])
    yp = lax.conv_general_dilated(
        x, kp, window_strides=(pack, sh, sw),
        padding=[(1, 1), (ph, ph), (pw, pw)],
        rhs_dilation=(1, dh, dw),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ho, wo = yp.shape[2], yp.shape[3]
    y = jnp.moveaxis(yp.reshape(b, d // pack, ho, wo, pack, co), 4, 2)
    return y.reshape(b, d, ho, wo, co)


def conv3d_auto(x, kernel, strides=(1, 1, 1), padding=(1, 1, 1),
                dilation=(1, 1, 1)):
    """Per-shape best conv3d schedule (v5e measurements, module docstring).

    Dispatch, for stride-1-D kd=3 convs on an accelerator backend:
      - Cout == 1 (classify heads), D % 8 == 0 -> dpack8   (2.4x isolated)
      - otherwise                              -> direct XLA conv
    opack4 measured 1.5x ISOLATED on 64->32 but loses in-model (it breaks
    XLA's pad/concat producer fusion and adds an unpack relayout), so it
    stays library-only. On CPU (tests) always direct XLA — the packed
    forms are exact but pointlessly slower there.
    """
    import jax

    d, ci, co = x.shape[1], x.shape[-1], kernel.shape[-1]
    ok = (jax.default_backend() != "cpu"
          and dpack2_applicable(d, kernel.shape, strides, padding, dilation))
    if ok and co == 1 and d % 8 == 0:
        return conv3d_dpack(x, kernel, strides, padding, dilation, pack=8)
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides,
        padding=[(p, p) for p in padding], rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_apply(x, kernel, strides=(1, 1, 1), padding=(1, 1, 1),
                 dilation=(1, 1, 1)):
    """Apply conv3d under the globally selected implementation."""
    if _IMPL == "tapped":
        return conv3d_tapped(x, kernel, strides, padding, dilation)
    if _IMPL == "dpack":
        d = x.shape[1]
        if dpack2_applicable(d, kernel.shape, strides, padding, dilation):
            return conv3d_dpack(x, kernel, strides, padding, dilation,
                                pack=4 if d % 4 == 0 else 2)
    if _IMPL == "auto":
        return conv3d_auto(x, kernel, strides, padding, dilation)
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides,
        padding=[(p, p) for p in padding], rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_tapped(x, kernel, strides, padding, dilation=(1, 1, 1)):
    """NDHWC conv3d via a tap-merged 2-D conv + strided D-axis tap sum.

    x: [B, D, H, W, Cin]; kernel: [kd, kh, kw, Cin, Cout] (same layout as
    flax nn.Conv); strides/padding/dilation: 3-tuples for (D, H, W).
    Returns [B, Do, Ho, Wo, Cout]. Equivalent to lax.conv_general_dilated
    with symmetric per-axis padding.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    sd, sh, sw = strides
    pd, ph, pw = padding
    dd, dh, dw = dilation

    # [kd, kh, kw, I, O] -> [kh, kw, I, kd*O]: each depth tap becomes an
    # output-channel group of the 2-D conv.
    k2 = jnp.transpose(kernel, (1, 2, 3, 0, 4)).reshape(kh, kw, cin, kd * cout)
    x2 = x.reshape(b * d, h, w, cin)
    y2 = lax.conv_general_dilated(
        x2, k2, window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y2.shape[1], y2.shape[2]
    y2 = y2.reshape(b, d, ho, wo, kd, cout)

    do = (d + 2 * pd - dd * (kd - 1) - 1) // sd + 1
    if pd:
        y2 = jnp.pad(y2, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(kd):
        start = t * dd
        sl = lax.slice_in_dim(
            y2[..., t, :], start, start + (do - 1) * sd + 1, stride=sd, axis=1)
        out = sl if out is None else out + sl
    return out


def conv3d_transpose_tapped(x, kernel, strides, padding, output_padding):
    """Transposed NDHWC conv3d with ConvTransposeExact semantics.

    Per-axis output length = (in-1)*stride - 2*padding + kernel +
    output_padding; the kernel is not spatially flipped. (H, W) handled by
    an input-dilated tap-merged 2-D conv; the D axis by a static
    scatter-add of each depth tap into its strided output positions.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    sd, sh, sw = strides
    pd, ph, pw = padding
    opd, oph, opw = output_padding

    k2 = jnp.transpose(kernel, (1, 2, 3, 0, 4)).reshape(kh, kw, cin, kd * cout)
    x2 = x.reshape(b * d, h, w, cin)
    pad_hw = [(kh - 1 - ph, kh - 1 - ph + oph),
              (kw - 1 - pw, kw - 1 - pw + opw)]
    y2 = lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=pad_hw,
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = y2.shape[1], y2.shape[2]
    y2 = y2.reshape(b, d, ho, wo, kd, cout)

    lo = kd - 1 - pd
    do_len = (d - 1) * sd - 2 * pd + kd + opd
    out = jnp.zeros((b, do_len, ho, wo, cout), y2.dtype)
    for t in range(kd):
        # input index di contributes tap t at output index lo - t + sd*di;
        # smallest valid di has lo - t + sd*di >= 0:
        di_min = max(0, (t - lo + sd - 1) // sd)
        do_start = lo - t + sd * di_min
        if do_start >= do_len or di_min >= d:
            continue
        n = min(d - di_min, (do_len - 1 - do_start) // sd + 1)
        if n <= 0:
            continue
        src = lax.slice_in_dim(y2[..., t, :], di_min, di_min + n, axis=1)
        out = out.at[:, do_start:do_start + sd * (n - 1) + 1:sd].add(src)
    return out


# ---------------------------------------------------------------------------
# 2-D row-packed schedule: the H axis of [B, H, W, C] images plays the same
# role D plays in the trunk-packed 3-D schedule. Full-resolution 2-D convs
# with 32 channels (StereoNet edge-aware refinement, backbone stages) leave
# 3/4 of the MXU idle; packing P consecutive rows into channels runs them
# 128-lane at P x the dense MACs — the measured-winning trade for the 3-D
# trunk (DESIGN.md §3). Supports 3x3 stride-1 convs with pad == dilation
# (the reference's 'same' dilated-conv convention, basic_layers.py:14-28);
# H-dilation folds into the packed-row window (offsets d*(t-1) land on
# packed-row/slot pairs), W-dilation passes through.


def pack_rows2d(x, pack):
    """[B, H, W, C] -> row-packed [B, H/pack, W, pack*C]."""
    b, h, w, c = x.shape
    assert h % pack == 0, (h, pack)
    xp = x.reshape(b, h // pack, pack, w, c)
    return jnp.moveaxis(xp, 2, 3).reshape(b, h // pack, w, pack * c)


def unpack_rows2d(xp, pack):
    """Row-packed [B, R, W, pack*C] -> [B, R*pack, W, C]."""
    b, r, w, pc = xp.shape
    c = pc // pack
    x = xp.reshape(b, r, w, pack, c)
    return jnp.moveaxis(x, 3, 2).reshape(b, r * pack, w, c)


def rowpack_kernel(kernel, pack, dil_h=1):
    """[3, kw, Ci, Co] -> packed-row kernel [wr, kw, P*Ci, P*Co].

    Output slot q, H-tap t (offset d*(t-1)) reads slot p of window row tj:
    P*(tj - lo) + p - q == d*(t-1), lo = ceil(d/P) (window wr = 2*lo + 1,
    apply with row padding (lo, lo)).
    """
    kh, kw, ci, co = kernel.shape
    assert kh == 3, kernel.shape
    lo = -(-dil_h // pack)
    wr = 2 * lo + 1
    kp = jnp.zeros((wr, kw, pack * ci, pack * co), kernel.dtype)
    for tj in range(wr):
        for p in range(pack):
            for q in range(pack):
                off = pack * (tj - lo) + p - q
                if off % dil_h == 0 and abs(off) <= dil_h:
                    t = off // dil_h + 1
                    kp = kp.at[tj, :, p * ci:(p + 1) * ci,
                               q * co:(q + 1) * co].set(kernel[t])
    return kp


def conv2d_rowpacked(xp, kernel, pack, dilation=(1, 1)):
    """3x3 stride-1 conv (pad == dilation) on a row-packed image.

    xp: [B, R, W, P*Ci]; kernel: [3, 3, Ci, Co]. Returns the row-packed
    output [B, R, W, P*Co]; semantics == lax.conv_general_dilated on the
    unpacked image with padding (dil_h, dil_w), rhs_dilation dilation.
    """
    kh, kw, ci, co = kernel.shape
    dh, dw = dilation
    assert kh == 3 and kw == 3, kernel.shape
    assert xp.shape[-1] == pack * ci, (xp.shape, kernel.shape, pack)
    lo = -(-dh // pack)
    kp = rowpack_kernel(kernel, pack, dh)
    return lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1), padding=[(lo, lo), (dw, dw)],
        rhs_dilation=(1, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"))
