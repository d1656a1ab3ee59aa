#!/usr/bin/env python
"""DeepPruner A/B on the honest distinct-input harness (VERDICT r2 #1).

Rows: warp-path PatchMatch (round-2 scoring) vs corr-path (precomputed
integer-shift correlation) vs corr-path + refinement rowpack.

Usage: python tools/ab_deeppruner.py [--iters 10] [--scale 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(cfg_name, iters, h, w, **overrides):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    cfg = get_config(cfg_name, **{"model.dtype": "bfloat16"}, **overrides)
    model = build_model(cfg)
    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r,
                                           train=False)["disps"][0])
    keys = jax.random.split(jax.random.PRNGKey(1), 2 * iters)
    frames = [(jax.device_put(jax.random.normal(keys[2 * i], (1, h, w, 3))),
               jax.device_put(jax.random.normal(keys[2 * i + 1],
                                                (1, h, w, 3))))
              for i in range(iters)]
    jax.block_until_ready(frames)
    fwd(*frames[0]).block_until_ready()
    fwd(*frames[1]).block_until_ready()
    t0 = time.perf_counter()
    outs = [fwd(l, r) for l, r in frames]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()
    name = f"DeepPruner/scene_flow_{args.scale}x"
    h, w = 384, 1280

    def record(label, fn):
        try:
            ms = fn()
            print(f"{label:46s} {ms:8.2f} ms  {1000/ms:6.2f} FPS", flush=True)
        except Exception as e:
            print(f"{label:46s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    record("warp-path PatchMatch (f32 warps, round-2)",
           lambda: bench(name, args.iters, h, w,
                         **{"model.disp_sampler.scoring": "warp"}))
    record("corr-path PatchMatch (windowed tent)",
           lambda: bench(name, args.iters, h, w,
                         **{"model.disp_sampler.scoring": "corr"}))
    record("corr-path + refinement rowpack=4",
           lambda: bench(name, args.iters, h, w,
                         **{"model.disp_sampler.scoring": "corr",
                            "model.disp_refinement.pack": 4}))


if __name__ == "__main__":
    main()
