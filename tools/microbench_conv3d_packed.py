"""Microbenchmark: dense vs D-packed conv3d schedules at PSMNet trunk shapes.

Motivation (docs/DESIGN.md "Where the remaining ~60 ms lives"): the PSM
aggregation trunk's convs with a 32-channel side run at ~16 TF/s on v5e
(output lanes < 128 starve the MXU) while 64->64 runs at ~137 TF/s. A
trunk-wide packed schedule (pack D into C once, block-sparse packed kernels
everywhere, unpack once) avoids the per-conv relayout that made
DMB_CONV3D_IMPL=dpack lose end-to-end. This script measures each conv class
in isolation ON PRE-PACKED inputs (no relayout in the timed region), which
is exactly the trunk-packed execution model.

Timing methodology: chained fori_loop inside one jit (carry perturbs the
input so iterations can't be CSE'd); per-iteration time = total/iters.
Sub-ms single-shot timings over the axon tunnel are untrustworthy
(docs/DESIGN.md "Timing over the axon tunnel").

Usage: python tools/microbench_conv3d_packed.py [--iters 30]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(name, fn, x, flops, iters):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x):
        def body(i, c):
            x_i, acc = c
            y = fn(x_i)
            # fold a scalar of the output back into the input so each
            # iteration depends on the previous (no CSE / hoisting)
            bump = jnp.mean(y[..., :1]).astype(x_i.dtype) * 1e-30
            return (x_i + bump, acc + bump)
        (_, acc) = lax.fori_loop(0, iters, body, (x, jnp.zeros((), x.dtype)))
        return acc

    chain(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    chain(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    tfs = flops / dt / 1e12
    print(f"{name:44s} {dt*1e3:8.3f} ms  {tfs:7.1f} TF/s(dense-eq)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from densematchingbenchmark_tpu.ops.conv3d import dpack_kernel

    print(f"backend={jax.default_backend()}")
    P = 4
    B, D, H, W = 1, 48, 96, 312  # PSMNet 1/4-res volume at 384x1248
    DT = jnp.bfloat16
    rng = np.random.RandomState(0)

    def conv(x, k, strides=(1, 1, 1), padding=(1, 1, 1), lhs_dil=(1, 1, 1),
             pads=None):
        return lax.conv_general_dilated(
            x, k, window_strides=strides,
            padding=pads if pads is not None else [(p, p) for p in padding],
            lhs_dilation=lhs_dil,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def mk(shape):
        return jnp.asarray(rng.randn(*shape), DT)

    def kmk(shape):
        return jnp.asarray(rng.randn(*shape) * 0.05, DT)

    # dense FLOPs of the true (unpacked) op, for dense-equivalent TF/s
    def cflops(vox, ci, co, k=27):
        return 2 * vox * ci * co * k

    vox_full = B * D * H * W
    vox_half = B * (D // 2) * (H // 2) * (W // 2)
    vox_quart = B * (D // 4) * (H // 4) * (W // 4)

    # ---- class A: stride-1 32->32 (dres1/classify trunk) ----
    k_a = kmk((3, 3, 3, 32, 32))
    x_a = mk((B, D, H, W, 32))
    timed("A dense 32->32 s1 full-res", lambda x: conv(x, k_a), x_a,
          cflops(vox_full, 32, 32), args.iters)
    kp_a = dpack_kernel(k_a, P)
    x_ap = mk((B, D // P, H, W, P * 32))
    timed(f"A packed{P} 128->128 s1", lambda x: conv(x, kp_a), x_ap,
          cflops(vox_full, 32, 32), args.iters)

    # ---- class B: stride-1 64->32 (dres0 in / deconv6-class lanes) ----
    k_b = kmk((3, 3, 3, 64, 32))
    x_b = mk((B, D, H, W, 64))
    timed("B dense 64->32 s1 full-res", lambda x: conv(x, k_b), x_b,
          cflops(vox_full, 64, 32), args.iters)
    kp_b = dpack_kernel(k_b, P)
    x_bp = mk((B, D // P, H, W, P * 64))
    timed(f"B packed{P} 256->128 s1", lambda x: conv(x, kp_b), x_bp,
          cflops(vox_full, 64, 32), args.iters)

    # ---- class C: stride-2 (D,H,W) 32->64 (hourglass conv1) ----
    k_c = kmk((3, 3, 3, 32, 64))
    x_c = mk((B, D, H, W, 32))
    timed("C dense 32->64 s2", lambda x: conv(x, k_c, strides=(2, 2, 2)),
          x_c, cflops(vox_half, 32, 64), args.iters)
    # packed->packed stride-2: window 4 over packed rows, stride 2, pad 1
    # block (r_off, p, q): true tap td = P*(r_off-1) + p - 2q + 1
    kp_c = jnp.zeros((4, 3, 3, P * 32, P * 64), DT)
    for r_off in range(4):
        for p in range(P):
            for q in range(P):
                td = P * (r_off - 1) + p - 2 * q + 1
                if 0 <= td <= 2:
                    kp_c = kp_c.at[r_off, :, :, p * 32:(p + 1) * 32,
                                   q * 64:(q + 1) * 64].set(k_c[td])
    x_cp = mk((B, D // P, H, W, P * 32))
    timed(f"C packed{P} s2 win4 128->256",
          lambda x: conv(x, kp_c, strides=(2, 2, 2),
                         pads=[(1, 1), (1, 1), (1, 1)]),
          x_cp, cflops(vox_half, 32, 64), args.iters)

    # ---- class D: deconv 64->32 k3 s2 p1 op1 (hourglass deconv6) ----
    # dense: lhs-dilated conv, pad (k-1-p, k-1-p+op) = (1,2)
    k_d = kmk((3, 3, 3, 64, 32))
    x_d = mk((B, D // 2, H // 2, W // 2, 64))
    timed("D dense deconv 64->32 (dil)",
          lambda x: conv(x, k_d, lhs_dil=(2, 2, 2),
                         pads=[(1, 2)] * 3),
          x_d, cflops(vox_full, 64, 32), args.iters)
    # unpacked-input -> packed-output: D-axis window 3 stride 2 pad (0,1);
    # block (r_off, q): true tap td = q - 2*r_off + 1
    kp_d = jnp.zeros((3, 3, 3, 64, P * 32), DT)
    for r_off in range(3):
        for q in range(P):
            td = q - 2 * r_off + 1
            if 0 <= td <= 2:
                kp_d = kp_d.at[r_off, :, :, :, q * 32:(q + 1) * 32].set(
                    k_d[td])
    timed(f"D deconv->packed{P} out lanes 128",
          lambda x: conv(x, kp_d, strides=(2, 1, 1), lhs_dil=(1, 2, 2),
                         pads=[(0, 1), (1, 2), (1, 2)]),
          x_d, cflops(vox_full, 64, 32), args.iters)

    # ---- class E: classify final 32->1 ----
    k_e = kmk((3, 3, 3, 32, 1))
    x_e = mk((B, D, H, W, 32))
    timed("E dense 32->1 s1", lambda x: conv(x, k_e), x_e,
          cflops(vox_full, 32, 1), args.iters)
    kp_e = dpack_kernel(k_e, P)
    x_ep = mk((B, D // P, H, W, P * 32))
    timed(f"E packed{P} 128->4 s1", lambda x: conv(x, kp_e), x_ep,
          cflops(vox_full, 32, 1), args.iters)

    # ---- class F: 64->64 s1 at half-res (hourglass conv2 / deconv5) ----
    k_f = kmk((3, 3, 3, 64, 64))
    x_f = mk((B, D // 2, H // 2, W // 2, 64))
    timed("F dense 64->64 s1 half-res", lambda x: conv(x, k_f), x_f,
          cflops(vox_half, 64, 64), args.iters)
    kp_f = dpack_kernel(k_f, P)
    x_fp = mk((B, D // 2 // P, H // 2, W // 2, P * 64))
    timed(f"F packed{P} 256->256 s1 half-res", lambda x: conv(x, kp_f), x_fp,
          cflops(vox_half, 64, 64), args.iters)

    # ---- G: the one-time pack/unpack relayout cost ----
    def pack(x):
        b, d, h, w, c = x.shape
        xp = x.reshape(b, d // P, P, h, w, c)
        return jnp.moveaxis(xp, 2, 4).reshape(b, d // P, h, w, P * c)
    timed("G pack relayout full-res 32ch", pack, x_a, 1e9, args.iters)




def main2():
    """Second round: packed->packed deconvs, half-res packed s2, and
    D-folded banded classify (run with --round2)."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--round2", action="store_true")
    args, _ = ap.parse_known_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    print(f"backend={jax.default_backend()}")
    P = 4
    B, D, H, W = 1, 48, 96, 312
    DT = jnp.bfloat16
    rng = np.random.RandomState(0)

    def conv(x, k, strides=(1, 1, 1), lhs_dil=(1, 1, 1), pads=((1, 1),) * 3):
        return lax.conv_general_dilated(
            x, k, window_strides=strides, padding=list(pads),
            lhs_dilation=lhs_dil,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def mk(s):
        return jnp.asarray(rng.randn(*s), DT)

    def cflops(vox, ci, co, k=27):
        return 2 * vox * ci * co * k

    vox_full = B * D * H * W
    vox_half = B * (D // 2) * (H // 2) * (W // 2)
    vox_quart = B * (D // 4) * (H // 4) * (W // 4)

    def pdeconv_kernel(k, P):
        # packed->packed convtranspose k3 s2 p1 op1 on rows:
        # window 3, lhs_dilation 2, pad (1,2); block (t_hat, p, q):
        # true tap t = P*(t_hat-1) + 2p - q + 1
        kd, kh, kw, ci, co = k.shape
        kp = jnp.zeros((3, kh, kw, P * ci, P * co), DT)
        for th in range(3):
            for p in range(P):
                for q in range(P):
                    t = P * (th - 1) + 2 * p - q + 1
                    if 0 <= t <= 2:
                        kp = kp.at[th, :, :, p * ci:(p + 1) * ci,
                                   q * co:(q + 1) * co].set(k[t])
        return kp

    # D2a: packed->packed deconv 64->64 (deconv5, half->half... half->full? no:
    # deconv5 quarter->half res). shapes: in quarter [D/4/P? rows...]
    k5 = mk((3, 3, 3, 64, 64)) * 0.05
    x5p = mk((B, D // 4 // P * 1, H // 4, W // 4, P * 64))  # rows 3
    kp5 = pdeconv_kernel(k5, P)
    timed("D2a packed deconv5 256->256 q->h",
          lambda x: conv(x, kp5, lhs_dil=(2, 2, 2), pads=((1, 2),) * 3),
          x5p, cflops(vox_half, 64, 64), args.iters)
    x5 = mk((B, D // 4, H // 4, W // 4, 64))
    timed("D2a dense deconv5 64->64 q->h",
          lambda x: conv(x, k5, lhs_dil=(2, 2, 2), pads=((1, 2),) * 3),
          x5, cflops(vox_half, 64, 64), args.iters)

    # D2b: packed->packed deconv6 64->32 half->full
    k6 = mk((3, 3, 3, 64, 32)) * 0.05
    x6p = mk((B, D // 2 // P, H // 2, W // 2, P * 64))
    kp6 = pdeconv_kernel(k6, P)
    timed("D2b packed deconv6 256->128 h->f",
          lambda x: conv(x, kp6, lhs_dil=(2, 2, 2), pads=((1, 2),) * 3),
          x6p, cflops(vox_full, 64, 32), args.iters)

    # C2: packed s2 64->64 half->quarter (hourglass conv3)
    k3_ = mk((3, 3, 3, 64, 64)) * 0.05
    kp3 = jnp.zeros((4, 3, 3, P * 64, P * 64), DT)
    for r_off in range(4):
        for p in range(P):
            for q in range(P):
                td = P * (r_off - 1) + p - 2 * q + 1
                if 0 <= td <= 2:
                    kp3 = kp3.at[r_off, :, :, p * 64:(p + 1) * 64,
                                 q * 64:(q + 1) * 64].set(k3_[td])
    x3p = mk((B, D // 2 // P, H // 2, W // 2, P * 64))
    timed("C2 packed s2 256->256 h->q",
          lambda x: conv(x, kp3, strides=(2, 2, 2), pads=((1, 1),) * 3),
          x3p, cflops(vox_quart, 64, 64), args.iters)
    x3 = mk((B, D // 2, H // 2, W // 2, 64))
    timed("C2 dense s2 64->64 h->q",
          lambda x: conv(x, k3_, strides=(2, 2, 2)),
          x3, cflops(vox_quart, 64, 64), args.iters)

    # E2: classify final via D-folded banded 2-D conv, from packed4 layout
    ke = mk((3, 3, 3, 32, 1)) * 0.05
    # banded kernel [3,3, D*32, D]: out d <- in (d+td-1)*32+c
    kb = np.zeros((3, 3, D * 32, D), np.float32)
    for d in range(D):
        for td in range(3):
            s = d + td - 1
            if 0 <= s < D:
                kb[:, :, s * 32:(s + 1) * 32, d] = np.asarray(
                    ke[td], np.float32)[..., 0]
    kb = jnp.asarray(kb, DT)
    xep = mk((B, D // P, H, W, P * 32))

    def efold(x):
        b, r, h, w, pc = x.shape
        # packed [B,R,H,W,P*32] -> [B,H,W,D*32]
        xf = jnp.moveaxis(x, 1, 3).reshape(b, h, w, D * 32)
        y = lax.conv_general_dilated(
            xf, kb, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y  # [B,H,W,D]
    timed("E2 classify D-folded banded (from packed4)", efold, xep,
          cflops(vox_full, 32, 1), args.iters)

    # E3: same but starting from unpacked layout
    xe = mk((B, D, H, W, 32))

    def efold_u(x):
        b, d, h, w, c = x.shape
        xf = jnp.moveaxis(x, 1, 3).reshape(b, h, w, d * c)
        return lax.conv_general_dilated(
            xf, kb, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    timed("E3 classify D-folded banded (from dense)", efold_u, xe,
          cflops(vox_full, 32, 1), args.iters)


def main3():
    """Round 3: halo-packed s1 convs and H-opacked classify heads
    (ops/conv3d.py conv3d_hpack / conv3d_packed_classify) vs the window-3
    packed forms they would replace. Run with --round3."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--round3", action="store_true")
    args, _ = ap.parse_known_args()

    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.ops.conv3d import (
        conv3d_packed, conv3d_hpack, conv3d_packed_classify)

    print(f"backend={jax.default_backend()}")
    P = 4
    B, D, H, W = 1, 48, 96, 312
    DT = jnp.bfloat16
    rng = np.random.RandomState(0)

    def mk(s):
        return jnp.asarray(rng.randn(*s), DT)

    def cflops(vox, ci, co, k=27):
        return 2 * vox * ci * co * k

    vox_full = B * D * H * W

    # A: 32->32 s1 full-res (the ~9 x 1.68 ms trunk convs)
    k_a = mk((3, 3, 3, 32, 32)) * 0.05
    x_ap = mk((B, D // P, H, W, P * 32))
    timed("A packed4 win3 128->128 s1", lambda x: conv3d_packed(x, k_a, P),
          x_ap, cflops(vox_full, 32, 32), args.iters)
    timed("A hpack 192->128 s1 (halo in-loop)",
          lambda x: conv3d_hpack(x, k_a, P),
          x_ap, cflops(vox_full, 32, 32), args.iters)

    # B: 64->32 s1 full-res (dres0 entry conv)
    k_b = mk((3, 3, 3, 64, 32)) * 0.05
    x_bp = mk((B, D // P, H, W, P * 64))
    timed("B packed4 win3 256->128 s1", lambda x: conv3d_packed(x, k_b, P),
          x_bp, cflops(vox_full, 64, 32), args.iters)
    timed("B hpack 384->128 s1",
          lambda x: conv3d_hpack(x, k_b, P),
          x_bp, cflops(vox_full, 64, 32), args.iters)

    # F: 64->64 s1 half-res (hourglass interior)
    k_f = mk((3, 3, 3, 64, 64)) * 0.05
    x_fp = mk((B, D // 2 // P, H // 2, W // 2, P * 64))
    timed("F packed4 win3 256->256 s1 half",
          lambda x: conv3d_packed(x, k_f, P),
          x_fp, cflops(vox_full // 8, 64, 64), args.iters)
    timed("F hpack 384->256 s1 half",
          lambda x: conv3d_hpack(x, k_f, P),
          x_fp, cflops(vox_full // 8, 64, 64), args.iters)

    # E: classify 32->1
    k_e = mk((3, 3, 3, 32, 1)) * 0.05
    x_ep = mk((B, D // P, H, W, P * 32))
    timed("E packed4 win3 128->4", lambda x: conv3d_packed(x, k_e, P),
          x_ep, cflops(vox_full, 32, 1), args.iters)
    for hq in (8, 16, 32):
        timed(f"E classify hq={hq} lanes={hq*P}",
              lambda x, hq=hq: conv3d_packed_classify(x, k_e, P, hq),
              x_ep, cflops(vox_full, 32, 1), args.iters)
    from densematchingbenchmark_tpu.ops.conv3d import conv3d_hpack_classify
    for hq in (16, 32, 96):
        timed(f"E classify halo hq={hq} lanes={hq*P}",
              lambda x, hq=hq: conv3d_hpack_classify(x, k_e, P, hq),
              x_ep, cflops(vox_full, 32, 1), args.iters)


if __name__ == "__main__":
    import sys as _s
    if "--round3" in _s.argv:
        main3()
    elif "--round2" in _s.argv:
        main2()
    else:
        main()
