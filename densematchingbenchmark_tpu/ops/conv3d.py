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
"""

import os

import jax.numpy as jnp
from jax import lax

_IMPL = os.environ.get("DMB_CONV3D_IMPL", "xla")


def set_impl(name: str):
    """Select the global conv3d implementation: 'tapped' or 'xla'."""
    global _IMPL
    assert name in ("tapped", "xla"), name
    _IMPL = name


def get_impl() -> str:
    return _IMPL


def use_tapped() -> bool:
    return _IMPL == "tapped"


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
