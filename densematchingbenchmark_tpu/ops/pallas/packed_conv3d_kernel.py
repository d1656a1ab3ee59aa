"""True-MAC Pallas kernel for the packed 3-D aggregation trunk (stride-1).

Why: the XLA trunk-packed schedule (ops/conv3d.py) runs the PSMNet-class
stride-1 3x3x3 convs as dense [P*Ci, P*Co] contractions whose packed kernel
is 75% structural zeros (pack=4) — ~95% MXU occupancy but 4x the necessary
MACs, capping PSMNet at ~24-26 FPS (docs/DESIGN.md §3). This kernel keeps
128-wide lanes while doing (nearly) only true MACs:

  * Depth taps fold into the CONTRACTION dim: for a pair of output depth
    slots (2q, 2q+1) the 3 depth taps span 4 consecutive input depth
    slices -> K = 4*Ci (= 128 lanes at Ci=32, exactly one MXU pass).
  * Spatial taps fold into the OUTPUT dim: one matmul produces
    z[(h,w), (slot, th, tw, o)] with N = 2*9*Co (= 576), and a cheap VPU
    shifted-add over the 9 (th, tw) taps reduces z to the conv output.
    All N columns are true weights (td is determined by slot+row).

  Per 2-slot window: [M, 4Ci] x [4Ci, 2*9*Co]; the only non-true MACs are
  the K-band overlap (slot 0 uses rows 0..2, slot 1 rows 1..3: 75% band
  density) and the N pad 576->640 — ~60-67% true-MAC MXU utilization vs
  25% for the dense packed form.

The depth-neighbor halo is assembled in VMEM by lane-concatenating the
packed rows r-1, r, r+1 (zero HBM halo materialization — the reason the
equivalent XLA "hpack" schedule loses end-to-end is exactly that it must
materialize the widened volume in HBM).

Scope: kd=kh=kw=3, stride 1, padding 1, even pack, H % h_tile == 0.
Gradient support: conv3d_packed_s1_pallas is wrapped in jax.custom_vjp
whose backward runs the XLA packed conv's VJP — the Pallas kernel
accelerates forward/inference, training backward stays on the (already
parity-tested) XLA path.

Reference workload: dmb/modeling/stereo/cost_processors/aggregators/
PSMNet.py:9-95 (and AcfNet.py/GCNet.py trunks).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_weights(kernel, ci=None):
    """[3,3,3,Ci,Co] -> [4*Ci, 2*9*Co] two-slot window weight matrix.

    Row block (s+td) holds tap td of output slot s; column block
    (s*9 + th*3 + tw) holds output channel group of spatial tap (th, tw).
    Identical for every window position (the window start only shifts which
    input lanes are sliced).
    """
    kd, kh, kw, ci_, co = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3), kernel.shape
    ci = ci_ if ci is None else ci
    w = jnp.zeros((4 * ci, 2 * 9 * co), kernel.dtype)
    for s in range(2):
        for td in range(3):
            r = s + td
            # [kh, kw, ci, co] -> rows ci, cols (th*3+tw)*co
            blk = kernel[td].reshape(9, ci, co)
            for t in range(9):
                col = (s * 9 + t) * co
                w = w.at[r * ci:(r + 1) * ci, col:col + co].set(blk[t])
    return w


def _kernel(x00, x01, x10, x11, x20, x21, w_ref, scale_ref, bias_ref,
            out_ref, *, h_t, w, pack, ci, co, relu, variant="full"):
    """x{dr}{0,1}: [1,1,h_t,Wp,P*Ci] main/halo blocks for packed row r-1+dr.

    Assembles the 3-row lane concat, then per 2-slot window: lane-slice the
    4-depth-slice K band, one MXU matmul to tap-expanded z, VPU shifted-add
    over the 9 spatial taps, fused scale/bias/ReLU epilogue.

    variant: measurement-only ablations (WRONG numerics except "full"):
      "noshift" — epilogue adds without the sublane/lane offsets;
      "nocat"   — matmul fed from one input block (skips concat+slice).
    """
    wp = w + 2
    if variant != "nocat":
        slabs = []
        for main, halo in ((x00, x01), (x10, x11), (x20, x21)):
            slabs.append(jnp.concatenate([main[0, 0], halo[0, 0, :2]],
                                         axis=0))
        wide = jnp.concatenate(slabs, axis=-1)    # [h_t+2, Wp, 3*P*Ci]

    outs = []
    for qw in range(pack // 2):
        if variant == "nocat":
            xw = jnp.concatenate([x10[0, 0], x11[0, 0, :2]], axis=0)
            xw = xw[:, :, :4 * ci] if xw.shape[-1] >= 4 * ci else \
                jnp.concatenate([xw, xw], -1)[:, :, :4 * ci]
        else:
            start = (2 * qw + pack - 1) * ci
            xw = wide[:, :, start:start + 4 * ci]
        # rank-3 matmul (leading dims batched): avoids merging the
        # Wp-sublane dim into M, which forced a whole-slab relayout
        z = jax.lax.dot_general(
            xw, w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [h_t+2, Wp, 2*9*Co]
        for s in range(2):
            if variant == "full":
                # group the 9 shifted adds by tw: the th slices (leading
                # dim) and lane selects are cheap; only 3 adds pay a
                # sublane (W) shift
                acc = jnp.zeros((h_t, w, co), jnp.float32)
                for tw in range(3):
                    t = jnp.zeros((h_t, wp, co), jnp.float32)
                    for th in range(3):
                        base = (s * 9 + th * 3 + tw) * co
                        t = t + z[th:th + h_t, :, base:base + co]
                    acc = acc + t[:, tw:tw + w, :]
            else:
                acc = jnp.zeros((h_t, w, co), jnp.float32)
                for th in range(3):
                    for tw in range(3):
                        base = (s * 9 + th * 3 + tw) * co
                        acc = acc + z[0:h_t, 0:w, base:base + co]
            outs.append(acc)
    y = jnp.concatenate(outs, axis=-1)            # [h_t, w, P*Co]
    y = y * scale_ref[0] + bias_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, 0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("pack", "relu", "h_tile", "interpret", "out_dtype",
                     "variant"))
def _forward(xp, wmat, scale, bias, pack, relu, h_tile, interpret,
             out_dtype, variant="full"):
    b, r, h, w, pci = xp.shape
    ci = pci // pack
    co = wmat.shape[1] // 18
    h_t = h_tile
    assert h % h_t == 0, (h, h_t)

    # prepad: packed-row axis +-1 (depth zero boundary); H 1 top and h_t-1
    # bottom (so the k+1 halo block exists for the last tile); W +-1.
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, h_t - 1), (1, 1), (0, 0)))
    wp = w + 2

    def spec(dr, hoff):
        return pl.BlockSpec(
            (1, 1, h_t, wp, pci),
            lambda i, j, k, dr=dr, hoff=hoff: (i, j + dr, k + hoff, 0, 0),
            memory_space=pltpu.VMEM)

    wmat = wmat.astype(xp.dtype)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32),
                             (pack * co,)).reshape(1, pack * co)
    bias = jnp.broadcast_to(jnp.asarray(bias, jnp.float32),
                            (pack * co,)).reshape(1, pack * co)

    grid = (b, r, h // h_t)
    true_flops = 2 * b * r * pack * h * w * 27 * ci * co
    return pl.pallas_call(
        functools.partial(_kernel, h_t=h_t, w=w, pack=pack, ci=ci, co=co,
                          relu=relu, variant=variant),
        grid=grid,
        in_specs=[spec(0, 0), spec(0, 1), spec(1, 0), spec(1, 1),
                  spec(2, 0), spec(2, 1),
                  pl.BlockSpec((4 * ci, 18 * co), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, pack * co), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, pack * co), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h_t, w, pack * co),
                               lambda i, j, k: (i, j, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, h, w, pack * co), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=true_flops,
            bytes_accessed=xp.size * xp.dtype.itemsize * 3
            + b * r * h * w * pack * co * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xpad, xpad, xpad, xpad, xpad, xpad, wmat, scale, bias)


def _full_epilogue(v, pack, co):
    """Normalize a scalar / [Co] / [pack*Co] epilogue term to [pack*Co]."""
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        return jnp.broadcast_to(v, (pack * co,))
    if v.size == co:
        return jnp.tile(v.reshape(co), pack)
    assert v.size == pack * co, (v.shape, pack, co)
    return v.reshape(pack * co)


def conv3d_packed_s1_pallas(xp, kernel, scale=1.0, bias=0.0, pack=4,
                            relu=False, h_tile=8, interpret=False):
    """Stride-1 3x3x3 conv (+scale/bias/ReLU) on a packed volume.

    Args:
      xp: [B, R, H, W, pack*Ci] packed volume (pack_volume layout).
      kernel: [3, 3, 3, Ci, Co] true (unpacked) conv kernel.
      scale, bias: scalar, [Co] or [pack*Co] fused epilogue (folded BN);
        default is a plain conv.
      pack: even; H % h_tile == 0.

    Returns [B, R, H, W, pack*Co] in xp.dtype. Numerics == the XLA
    conv3d_packed path followed by the affine epilogue. Backward runs the
    XLA packed conv's VJP (see module docstring); epilogue-term gradients
    flow through the broadcast done here.
    """
    co = kernel.shape[-1]
    return _pallas_vjp(xp, kernel, _full_epilogue(scale, pack, co),
                       _full_epilogue(bias, pack, co), pack, relu, h_tile,
                       interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _pallas_vjp(xp, kernel, scale, bias, pack, relu, h_tile, interpret):
    ci = xp.shape[-1] // pack
    wmat = window_weights(kernel, ci)
    return _forward(xp, wmat, scale, bias, pack, relu, h_tile, interpret,
                    jnp.dtype(xp.dtype).name)


def _xla_reference(xp, kernel, scale, bias, pack, relu):
    """The parity oracle / VJP provider: XLA packed conv + epilogue.

    scale/bias: [pack*Co] (already normalized).
    """
    from ..conv3d import dpack_kernel
    from jax import lax
    kp = dpack_kernel(kernel, pack).astype(xp.dtype)
    y = lax.conv_general_dilated(
        xp, kp, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = y.astype(jnp.float32) * scale.reshape(1, 1, 1, 1, -1) \
        + bias.reshape(1, 1, 1, 1, -1)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(xp.dtype)


def _fwd(xp, kernel, scale, bias, pack, relu, h_tile, interpret):
    out = _pallas_vjp(xp, kernel, scale, bias, pack, relu, h_tile,
                      interpret)
    return out, (xp, kernel, scale, bias)


def _bwd(pack, relu, h_tile, interpret, res, g):
    xp, kernel, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, k, s, bb: _xla_reference(x, k, s, bb, pack, relu),
        xp, kernel, scale, bias)
    return vjp(g)


_pallas_vjp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# v2: rolling-window manual DMA. The BlockSpec version above reads every
# packed row 3x (as prev/cur/next of three grid steps); this variant grids
# over (B, H/h_t) only, keeps the input in HBM, and streams rows through a
# VMEM ring of 4 slots (double-buffered: row r+1 prefetches while row r
# computes), so each row is read once per H-tile — input traffic drops from
# 3(1+2/h_t)x to (1+2/h_t)x of the volume. Same matmul/epilogue math as v1.


def _kernel_v2(x_hbm, w_ref, scale_ref, bias_ref, out_ref, buf, sems, *,
               h_t, w, r_rows, pack, ci, co, relu):
    """x_hbm: [B, R+2, Hp, Wp, P*Ci] (pre-padded) resident in HBM.
    buf: VMEM ring [4, h_t+2, Wp, P*Ci]; sems: 4 DMA semaphores.
    Grid (B, H/h_t); loops packed rows 0..R-1 internally."""
    b = pl.program_id(0)
    k = pl.program_id(1)
    wp = w + 2
    pci = pack * ci

    def row_dma(slot, rr):
        return pltpu.make_async_copy(
            x_hbm.at[b, rr, pl.ds(k * h_t, h_t + 2)],
            buf.at[slot], sems.at[slot])

    # warm up: rows 0, 1, 2 of the padded volume into slots 0..2; rows 0, 1
    # are waited here, each later row exactly once inside the loop (a DMA
    # semaphore signals once — double-waiting would deadlock)
    for rr in range(3):
        row_dma(rr, rr).start()
    row_dma(0, 0).wait()
    row_dma(1, 1).wait()

    def body(r, _):
        # prefetch row r+3 into the retired slot ((r-1) % 4, unreferenced)
        @pl.when(r + 3 < r_rows + 2)
        def _():
            row_dma((r + 3) % 4, r + 3).start()
        row_dma((r + 2) % 4, r + 2).wait()  # newest row for this window

        slabs = [buf[(r + dr) % 4] for dr in range(3)]
        wide = jnp.concatenate(slabs, axis=-1)      # [h_t+2, Wp, 3*P*Ci]
        outs = []
        for qw in range(pack // 2):
            start = (2 * qw + pack - 1) * ci
            xw = wide[:, :, start:start + 4 * ci]
            xw = xw.reshape((h_t + 2) * wp, 4 * ci)
            z = jnp.dot(xw, w_ref[...],
                        preferred_element_type=jnp.float32)
            z = z.reshape(h_t + 2, wp, 2 * 9 * co)
            for s in range(2):
                acc = jnp.zeros((h_t, w, co), jnp.float32)
                for th in range(3):
                    for tw in range(3):
                        base = (s * 9 + th * 3 + tw) * co
                        acc = acc + z[th:th + h_t, tw:tw + w,
                                      base:base + co]
                outs.append(acc)
        y = jnp.concatenate(outs, axis=-1)
        y = y * scale_ref[0] + bias_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, r, 0] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, r_rows, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("pack", "relu", "h_tile", "interpret", "out_dtype"))
def _forward_v2(xp, wmat, scale, bias, pack, relu, h_tile, interpret,
                out_dtype):
    b, r, h, w, pci = xp.shape
    ci = pci // pack
    co = wmat.shape[1] // 18
    h_t = h_tile
    assert h % h_t == 0, (h, h_t)
    xpad = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    wp = w + 2

    wmat = wmat.astype(xp.dtype)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32),
                             (pack * co,)).reshape(1, pack * co)
    bias = jnp.broadcast_to(jnp.asarray(bias, jnp.float32),
                            (pack * co,)).reshape(1, pack * co)

    grid = (b, h // h_t)
    out5 = pl.pallas_call(
        functools.partial(_kernel_v2, h_t=h_t, w=w, r_rows=r, pack=pack,
                          ci=ci, co=co, relu=relu),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((4 * ci, 18 * co), lambda i, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, pack * co), lambda i, k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, pack * co), lambda i, k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 1, h_t, w, pack * co),
                               lambda i, k: (i, 0, k, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, h // h_t, h_t, w, pack * co),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((4, h_t + 2, wp, pci), xp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * pack * h * w * 27 * ci * co,
            bytes_accessed=xpad.size * xpad.dtype.itemsize
            + b * r * h * w * pack * co * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xpad, wmat, scale, bias)
    # [B, R, H/h_t, h_t, W, PC] -> [B, R, H, W, PC]
    return out5.reshape(b, r, h, w, pack * co)


def conv3d_packed_s1_pallas_v2(xp, kernel, scale=1.0, bias=0.0, pack=4,
                               relu=False, h_tile=8, interpret=False):
    """Rolling-DMA variant of conv3d_packed_s1_pallas (same contract; no
    custom VJP — inference-only A/B candidate)."""
    co = kernel.shape[-1]
    ci = xp.shape[-1] // pack
    wmat = window_weights(kernel, ci)
    return _forward_v2(xp, wmat, _full_epilogue(scale, pack, co),
                       _full_epilogue(bias, pack, co), pack, relu, h_tile,
                       interpret, jnp.dtype(xp.dtype).name)
