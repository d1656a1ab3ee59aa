"""Microbench: Pallas true-MAC packed s1 conv vs XLA packed conv (TPU).

Chained iterations (each conv consumes the previous output) so the axon
tunnel's async dispatch cannot memoize or overlap-away the work
(DESIGN.md §3 timing methodology). Shapes: the PSMNet aggregation trunk at
384x1248 eval (R=12, H=96, W=312, pack=4).

Usage: python tools/microbench_pallas_packed.py [--h_tile 8 16] [--iters 20]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--h_tiles", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--pack", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from densematchingbenchmark_tpu.ops.conv3d import (
        pack_volume, dpack_kernel)
    from densematchingbenchmark_tpu.ops.pallas.packed_conv3d_kernel import (
        conv3d_packed_s1_pallas, conv3d_packed_s1_pallas_v2)
    from jax import lax

    dt = jnp.dtype(args.dtype)
    P = args.pack
    cases = [
        ("32->32 full-res", (1, 48, 96, 312), 32, 32),
        ("64->32 full-res", (1, 48, 96, 312), 64, 32),
        ("64->64 half-res", (1, 24, 48, 156), 64, 64),
    ]
    print(f"backend={jax.default_backend()} dtype={dt} pack={P}")
    for name, (b, d, h, w), ci, co in cases:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, d, h, w, ci) * .1, dt)
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * .05, dt)
        xp = pack_volume(x, P)
        true_gflop = 2 * b * d * h * w * 27 * ci * co / 1e9

        # chainable: project output channels back to ci with a concat/slice
        def rechain(y, ci=ci, co=co):
            if co == ci:
                return y
            reps = (ci + co - 1) // co
            return jnp.concatenate([y] * reps, -1)[..., :P * ci]

        kp = dpack_kernel(k, P).astype(dt)

        @jax.jit
        def xla_fn(v):
            y = lax.conv_general_dilated(
                v, kp, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return rechain(y)

        t_x = timeit(xla_fn, xp, args.iters)
        print(f"{name}: XLA packed   {t_x*1e3:7.3f} ms "
              f"({true_gflop/t_x/1e3:6.1f} true-TF/s)")

        for h_t in args.h_tiles:
            if h % h_t:
                continue
            for label, fn in (("v1", conv3d_packed_s1_pallas),
                              ("v2", conv3d_packed_s1_pallas_v2)):
                @jax.jit
                def pl_fn(v, h_t=h_t, fn=fn):
                    return rechain(fn(v, k, pack=P, h_tile=h_t))

                try:
                    t_p = timeit(pl_fn, xp, args.iters)
                    print(f"{name}: pallas-{label} h_t={h_t:<2d} "
                          f"{t_p*1e3:7.3f} ms "
                          f"({true_gflop/t_p/1e3:6.1f} true-TF/s)  "
                          f"{t_x/t_p:4.2f}x")
                except Exception as e:
                    print(f"{name}: pallas-{label} h_t={h_t} FAILED: "
                          f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
