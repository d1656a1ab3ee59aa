"""Fused trilinear-upsample + soft-argmin (Pallas TPU kernel).

The PSMNet/AcfNet eval hot path upsamples the aggregated low-res cost
volume (e.g. [1, 48, 96, 312]) to full resolution ([1, 192, 384, 1248],
~370 MB in f32) and then runs softmax-expectation over it — two full-volume
HBM round-trips that profiling shows dominate inference. This kernel fuses
the whole chain: the low-res volume (a few MB) lives in VMEM once, each
output row is produced by
  1. dynamic-slicing the two source rows (H interpolation),
  2. a [D', W'] x [W', W] matmul against a static 2-tap W-interpolation
     matrix (MXU),
  3. a [D, D'] x [D', W] matmul against the D-interpolation matrix (MXU),
  4. a fused softmax-expectation over D (VPU),
and only the [H, W] disparity map is written back.

Reference implementation (correctness oracle): ops/interpolate.upsample_3d
(align_corners=True) + ops/soft_argmin.soft_argmin.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cost_volume import disp_sample_values


def _interp_matrix(in_size, out_size):
    """[in_size, out_size] align_corners=True linear interpolation matrix."""
    m = np.zeros((in_size, out_size), np.float32)
    if out_size == 1 or in_size == 1:
        m[0, :] = 1.0
        return m
    x = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    i0 = np.minimum(np.floor(x).astype(np.int64), in_size - 2)
    frac = (x - i0).astype(np.float32)
    m[i0, np.arange(out_size)] = 1.0 - frac
    m[i0 + 1, np.arange(out_size)] = frac
    return m


ROWS_PER_STEP = 8  # Mosaic wants the output sublane block divisible by 8


def _kernel(cost_ref, mw_ref, mdt_ref, vals_ref, out_ref, *,
            in_h, out_h, alpha):
    j = pl.program_id(1)
    for r in range(ROWS_PER_STEP):
        h = j * ROWS_PER_STEP + r
        if out_h == 1 or in_h == 1:
            h0 = 0
            frac = jnp.float32(0.0)
        else:
            pos = h.astype(jnp.float32) * ((in_h - 1) / (out_h - 1))
            h0f = jnp.floor(pos)
            h0 = jnp.minimum(h0f.astype(jnp.int32), in_h - 2)
            frac = pos - h0.astype(jnp.float32)

        slab0 = cost_ref[0, :, pl.ds(h0, 1), :][:, 0, :].astype(jnp.float32)
        slab1 = cost_ref[0, :, pl.ds(jnp.minimum(h0 + 1, in_h - 1), 1), :][
            :, 0, :].astype(jnp.float32)
        slab = slab0 * (1.0 - frac) + slab1 * frac            # [D', W']

        up_w = jnp.dot(slab, mw_ref[:], preferred_element_type=jnp.float32)
        up = jnp.dot(up_w.T, mdt_ref[:],
                     preferred_element_type=jnp.float32).T    # [D, W]
        c = up * alpha
        m = jnp.max(c, axis=0, keepdims=True)
        e = jnp.exp(c - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        out_ref[0, r, :] = jnp.sum(p * vals_ref[:], axis=0)


@functools.partial(jax.jit, static_argnames=("out_d", "out_h", "out_w",
                                             "start_disp", "dilation",
                                             "alpha", "interpret"))
def fused_upsample_soft_argmin(low_cost, out_d, out_h, out_w, start_disp=0,
                               dilation=1, alpha=1.0, interpret=False):
    """[B, D', H', W'] low-res cost -> [B, out_h, out_w, 1] disparity.

    Equivalent to soft_argmin(upsample_3d(low_cost, out_d, out_h, out_w,
    align_corners=True), max_disp=out_d * dilation, ...).
    """
    b, d_in, h_in, w_in = low_cost.shape
    # the Mosaic TPU compiler is required for compiled mode; fall back to
    # the interpreter on CPU so the same model code runs everywhere
    interpret = interpret or jax.default_backend() == "cpu"
    # Mosaic can't (yet) dynamic-slice the sublane axis of bf16 tiles; the
    # low-res volume is tiny, so promote to f32 before the kernel
    low_cost = low_cost.astype(jnp.float32)
    mw = jnp.asarray(_interp_matrix(w_in, out_w))          # [W', W]
    # transposed D matrix so the kernel's second matmul is (W, D')x(D', D)
    mdt = jnp.asarray(_interp_matrix(d_in, out_d))         # [D', D]
    max_disp = out_d * dilation
    vals = disp_sample_values(max_disp, start_disp, dilation)
    assert len(vals) == out_d
    vals = jnp.asarray(vals, jnp.float32)[:, None]

    assert out_h % ROWS_PER_STEP == 0, (
        f"fused kernel needs out_h % {ROWS_PER_STEP} == 0, got {out_h}")
    out = pl.pallas_call(
        functools.partial(_kernel, in_h=h_in, out_h=out_h, alpha=alpha),
        grid=(b, out_h // ROWS_PER_STEP),
        in_specs=[
            pl.BlockSpec((1, d_in, h_in, w_in), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, out_w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, out_d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_STEP, out_w),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(low_cost, mw, mdt, vals)
    return out[..., None]
