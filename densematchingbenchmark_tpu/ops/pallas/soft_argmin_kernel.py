"""Fused softmax-expectation disparity regression (Pallas TPU kernel).

Reference implementation: ops/soft_argmin.py (softmax over D + weighted
sum). Grid cell = (batch, 8-row band); a [D, 8, W] tile lives in VMEM and
the column softmax + expectation against the static disparity values fuse
into a single VPU sweep — the cost volume is read from HBM exactly once
and only the [H, W] disparity map is written back.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cost_volume import disp_sample_values

ROWS_PER_STEP = 8  # Mosaic wants the output sublane block divisible by 8


def _kernel(cost_ref, vals_ref, out_ref, *, alpha):
    for r in range(ROWS_PER_STEP):
        c = cost_ref[0, :, r, :].astype(jnp.float32) * alpha   # [D, W]
        m = jnp.max(c, axis=0, keepdims=True)
        e = jnp.exp(c - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        out_ref[0, r, :] = jnp.sum(p * vals_ref[:], axis=0)    # [W]


@functools.partial(jax.jit, static_argnames=("max_disp", "start_disp",
                                             "dilation", "alpha",
                                             "interpret"))
def fused_soft_argmin(cost_volume, max_disp, start_disp=0, dilation=1,
                      alpha=1.0, interpret=False):
    """[B, D, H, W] cost -> [B, H, W, 1] disparity (uniform-range samples).

    Equivalent to ops.soft_argmin.soft_argmin(..., normalize=True).
    """
    b, d, h, w = cost_volume.shape
    interpret = interpret or jax.default_backend() == "cpu"
    assert h % ROWS_PER_STEP == 0, (
        f"fused_soft_argmin needs H % {ROWS_PER_STEP} == 0, got {h}")
    vals = disp_sample_values(max_disp, start_disp, dilation)
    assert len(vals) == d
    vals = jnp.asarray(vals, jnp.float32)[:, None]     # [D, 1]

    out = pl.pallas_call(
        functools.partial(_kernel, alpha=alpha),
        grid=(b, h // ROWS_PER_STEP),
        in_specs=[
            pl.BlockSpec((1, d, ROWS_PER_STEP, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_STEP, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cost_volume, vals)
    return out[..., None]
