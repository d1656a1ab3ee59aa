"""Fused 3x3x3 conv3d (+ scale/bias/ReLU epilogue) as im2col matmuls.

The PSMNet-class aggregation trunk runs 3x3x3 convs with 32 channels —
XLA's conv schedule leaves most of the 128-wide MXU idle there. This
kernel restructures each output tile as ONE [H_t*W, 9*Cin] x [9*Cin, Cout]
matmul per depth-tap (K = 288 for Cin=32), tripling the contraction depth
the MXU sees, and fuses the normalization epilogue
(out * scale + bias, optional ReLU — a folded inference BatchNorm) so the
activation round-trip to HBM disappears.

Layout/grid: input pre-padded to [B, D+2, H+PAD_H, W+2, C]; grid
(B, D, H/H_T). Halos are fetched via extra BlockSpecs (the d/d+1/d+2
depth slices and the next H-tile's first two rows), costing a 2x re-read
of the H dimension — compute, not input bandwidth, dominates this op.

Reference implementation (correctness oracle): lax.conv_general_dilated
with NDHWC/DHWIO and SAME padding. Supports stride 1 only.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_TILE = 8


def _kernel(x00, x01, x10, x11, x20, x21, w_ref, scale_ref, bias_ref,
            out_ref, *, h_t, w, cin, cout, relu, variant):
    """x{dd}{0,1}: [1, 1, h_t, w+2, cin] main/halo blocks for depth tap dd."""
    acc = jnp.zeros((h_t * w, cout), jnp.float32)
    for dd, (main, halo) in enumerate(((x00, x01), (x10, x11), (x20, x21))):
        slab = jnp.concatenate(
            [main[0, 0], halo[0, 0, :2]], axis=0)        # [h_t+2, w+2, cin]
        if variant == "im2col":
            cols = []
            for dh in range(3):
                for dw in range(3):
                    win = slab[dh:dh + h_t, dw:dw + w, :]  # [h_t, w, cin]
                    cols.append(win.reshape(h_t * w, cin))
            patches = jnp.concatenate(cols, axis=1)        # [h_t*w, 9*cin]
            acc = acc + jnp.dot(patches, w_ref[dd],
                                preferred_element_type=jnp.float32)
        else:  # "taps": 9 separate matmuls, no lane-dim relayout
            for t, (dh, dw) in enumerate((a, b) for a in range(3)
                                         for b in range(3)):
                win = slab[dh:dh + h_t, dw:dw + w, :].reshape(h_t * w, cin)
                acc = acc + jnp.dot(
                    win, w_ref[dd, t * cin:(t + 1) * cin],
                    preferred_element_type=jnp.float32)
    out = acc * scale_ref[0] + bias_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0, 0] = out.reshape(h_t, w, cout)


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "variant"))
def fused_conv3d(x, kernel, scale=None, bias=None, relu=False,
                 interpret=False, variant="im2col"):
    """3x3x3 stride-1 SAME conv with fused scale/bias/ReLU epilogue.

    Args:
      x: [B, D, H, W, Cin] input (any float dtype; H % 8 == 0).
      kernel: [3, 3, 3, Cin, Cout].
      scale, bias: [Cout] epilogue (e.g. folded BN); default 1 / 0.
      relu: apply max(0, .) after the epilogue.

    Returns: [B, D, H, W, Cout] float32.
    """
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, 3)
    assert h % H_TILE == 0, f"H must be a multiple of {H_TILE}, got {h}"
    interpret = interpret or jax.default_backend() == "cpu"
    h_t = H_TILE

    # pre-pad: depth +1 both sides; height +1 on top and h_t-1 on the
    # bottom so hp = h + h_t — the conv halo (1 row) is covered and the
    # (k+1) halo block exists for the last tile; width +1 both sides
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, h_t - 1), (1, 1), (0, 0)))
    hp = xp.shape[2]
    assert hp == h + h_t and hp % h_t == 0, (hp, h_t)

    wmat = jnp.stack([
        kernel[dd].reshape(9 * cin, cout).astype(jnp.float32)
        for dd in range(3)])                              # [3, 9*cin, cout]
    # note: reshape of kernel[dd] ([3,3,cin,cout]) orders rows as
    # (dh, dw, cin) — matching the kernel's patch concat order (dh, dw)
    scale = jnp.ones((1, cout), jnp.float32) if scale is None \
        else jnp.asarray(scale, jnp.float32).reshape(1, cout)
    bias = jnp.zeros((1, cout), jnp.float32) if bias is None \
        else jnp.asarray(bias, jnp.float32).reshape(1, cout)

    def spec(dd, hoff):
        return pl.BlockSpec(
            (1, 1, h_t, w + 2, cin),
            lambda i, j, k, dd=dd, hoff=hoff: (i, j + dd, k + hoff, 0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, h_t=h_t, w=w, cin=cin, cout=cout,
                          relu=relu, variant=variant),
        grid=(b, d, h // h_t),
        in_specs=[spec(0, 0), spec(0, 1), spec(1, 0), spec(1, 1),
                  spec(2, 0), spec(2, 1),
                  pl.BlockSpec((3, 9 * cin, cout), lambda i, j, k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, cout), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, cout), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h_t, w, cout),
                               lambda i, j, k: (i, j, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, xp, xp, xp, wmat, scale, bias)
    return out
