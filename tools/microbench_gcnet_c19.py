"""Microbenchmark: GCNet c19/c20 conv schedules at THEIR OWN shapes.

VERDICT r4 #1: the round-2 'Pallas cannot win' measurement was taken at
PSMNet trunk shapes, where XLA's packed conv already runs at ~95% of the
MXU's dense rate. GCNet's two worst full-res stages (c19: 128->64 lanes at
[48, 192, 624], c20: 64->64) run at only ~86% of a dense rate that is
itself ~half of peak — the deficit is XLA's W=624 spatial tiling, not MAC
sparsity. This tool measures, per-op on-chip at exactly those shapes:

  - the shipped hpack schedule at W=624 (baseline; DESIGN.md §8: 19.7 +
    16.0 ms/iter end-to-end attribution),
  - the same op on W zero-padded to 640 / 768 (static pad + crop — the
    masked-pad trunk schedule candidate, GCAggregator.w_pad),
  - the round-2 true-MAC Pallas kernel at these shapes (h_tile 8/16),
  - a fully-dense conv of the identical operand shapes (the dense-rate
    yardstick the 86% is measured against),
  - the dpack window-3 form (round-4 recorded loser, for continuity).

Reference workload: dmb/modeling/stereo/cost_processors/aggregators/
GCNet.py:31-37 (conv3_1/conv3_2 class at full cost-volume resolution).

Usage (real TPU, single client!): python tools/microbench_gcnet_c19.py
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
            bump = jnp.mean(y[..., :1]).astype(x_i.dtype) * 1e-30
            return (x_i + bump, acc + bump)
        (_, acc) = lax.fori_loop(0, iters, body, (x, jnp.zeros((), x.dtype)))
        return acc

    try:
        chain(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        chain(x).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    tfs = flops / dt / 1e12
    print(f"{name:52s} {dt*1e3:8.3f} ms  {tfs:7.1f} TF/s(true-MAC-eq)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stages", nargs="*", default=["c19", "c20"])
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from densematchingbenchmark_tpu.ops.conv3d import (
        conv3d_hpack, conv3d_shalo, dpack_kernel, hpack_kernel)
    from densematchingbenchmark_tpu.ops.pallas.packed_conv3d_kernel import (
        conv3d_packed_s1_pallas)

    print(f"backend={jax.default_backend()}")
    DT = jnp.bfloat16
    P = 2
    B, D, H, W = 1, 96, 192, 624   # GCNet half-res volume at 384x1248
    R = D // P
    rng = np.random.RandomState(0)

    # (name, Ci, Co) per stage; c18 concat feeds c21 etc. are strided —
    # these two are the stride-1 full-res pair the xplane blames
    stages = {"c19": (64, 32), "c20": (32, 32)}

    for sname in args.stages:
        ci, co = stages[sname]
        true_flops = 2 * 27 * ci * co * D * H * W * B
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.05, DT)
        xp = jnp.asarray(rng.randn(B, R, H, W, P * ci) * 0.5, DT)
        print(f"\n== {sname}: packed [{B},{R},{H},{W},{P*ci}] -> {P*co} "
              f"lanes, true {true_flops/1e12:.2f} TF ==")

        timed(f"{sname} hpack W=624 (shipped)",
              lambda x: conv3d_hpack(x, k, P), xp, true_flops, args.iters)

        # split-halo: same dense MACs, no halo-widened input materialization
        timed(f"{sname} shalo W=624",
              lambda x: conv3d_shalo(x, k, P), xp, true_flops, args.iters)

        for wp in (640, 768):
            xpad = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - W), (0, 0)))
            timed(f"{sname} hpack W={wp} (pad+crop candidate)",
                  lambda x: conv3d_hpack(x, k, P)[:, :, :, :W],
                  xpad, true_flops, args.iters)

        # round-2 true-MAC Pallas kernel, never before run at these shapes
        for ht in (8, 16):
            timed(f"{sname} pallas true-MAC h_tile={ht}",
                  lambda x, ht=ht: conv3d_packed_s1_pallas(
                      x, k, pack=P, h_tile=ht),
                  xp, true_flops, args.iters)
            xpad = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 640 - W),
                                (0, 0)))
            timed(f"{sname} pallas true-MAC h_tile={ht} W=640",
                  lambda x, ht=ht: conv3d_packed_s1_pallas(
                      x, k, pack=P, h_tile=ht)[:, :, :, :W],
                  xpad, true_flops, args.iters)

        # dense-rate yardstick: identical operand shapes, fully-dense 2-D
        # conv (what the hpack form lowers to, minus the structural zeros)
        kd = jnp.asarray(rng.randn(3, 3, (P + 2) * ci, P * co) * 0.05, DT)
        x2 = jnp.asarray(
            rng.randn(B * R, H, W, (P + 2) * ci) * 0.5, DT)
        dense_flops = 2 * 9 * (P + 2) * ci * P * co * (B * R) * H * W
        timed(f"{sname} dense 2-D rate yardstick W=624",
              lambda x: lax.conv_general_dilated(
                  x, kd, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                  dimension_numbers=("NHWC", "HWIO", "NHWC")),
              x2, dense_flops, args.iters)
        x2p = jnp.pad(x2, ((0, 0), (0, 0), (0, 640 - W), (0, 0)))
        timed(f"{sname} dense 2-D rate yardstick W=640",
              lambda x: lax.conv_general_dilated(
                  x, kd, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                  dimension_numbers=("NHWC", "HWIO", "NHWC")),
              x2p, dense_flops * 640 // W, args.iters)

        # dpack window-3 (round-4 recorded loser at these shapes)
        kp3 = dpack_kernel(k, P)
        timed(f"{sname} dpack win3 W=624 (r4 loser)",
              lambda x: lax.conv_general_dilated(
                  x, kp3, window_strides=(1, 1, 1),
                  padding=[(1, 1), (1, 1), (1, 1)],
                  dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
              xp, true_flops, args.iters)


if __name__ == "__main__":
    main()
