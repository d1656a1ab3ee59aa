"""One-shot TPU A/B roundup for the round-2 schedule candidates.

Runs, in order, on the real chip (single process — the tunnel is
single-client):
  1. microbench: XLA packed conv vs Pallas v1/v2 per trunk shape;
  2. PSMNet end-to-end 384x1248 b1: baseline vs s1='pallas' (each h_tile);
  3. StereoNet-4stage: refinement row-pack off/on;
  4. PSMNet: backbone row-pack off/on.
Prints a decision table; pick winners into configs/ + conv3d defaults.

Usage: python tools/tpu_ab_roundup.py [--iters 10] [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(cfg_name, iters, **overrides):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    cfg = get_config(cfg_name, **{"model.dtype": "bfloat16"}, **overrides)
    model = build_model(cfg)
    h, w = 384, 1248
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r,
                                           train=False)["disps"][0])
    # distinct frames, chained-free timing (model level is trustworthy)
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    frames = [jax.device_put(jax.random.normal(k, left.shape))
              for k in keys]
    jax.block_until_ready(frames)
    fwd(frames[0], frames[0]).block_until_ready()
    t0 = time.perf_counter()
    outs = [fwd(f, f) for f in frames]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="skip the per-op microbench")
    args = ap.parse_args()

    from densematchingbenchmark_tpu.ops import conv3d as c3

    if not args.quick:
        print("=== per-op microbench (XLA vs pallas v1/v2) ===")
        os.system(f"{sys.executable} tools/microbench_pallas_packed.py "
                  f"--iters {args.iters}")

    rows = []

    def record(name, fn):
        try:
            ms = fn()
            rows.append((name, ms))
            print(f"{name:44s} {ms:7.2f} ms  {1000/ms:6.2f} FPS")
        except Exception as e:
            rows.append((name, None))
            print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:120]}")

    print("\n=== end-to-end A/B (384x1248 b1, bf16) ===")
    record("PSMNet baseline (xla packed)",
           lambda: bench_model("PSMNet/scene_flow", args.iters))
    def psm_pallas():
        # h_tile is chosen inside the dispatch (16 when H % 16 == 0)
        c3.set_packed_schedules(s1="pallas")
        try:
            return bench_model("PSMNet/scene_flow", args.iters)
        finally:
            c3.set_packed_schedules(s1="auto")
    record("PSMNet s1=pallas", psm_pallas)
    # Configs now ship pack=4 by default; the "baseline" rows must force the
    # unpacked schedule explicitly or both sides of the A/B are identical.
    record("StereoNet-4stage refinement rowpack off",
           lambda: bench_model("StereoNet/scene_flow_8x_4stage", args.iters,
                               **{"model.disp_refinement.pack": 1}))
    record("StereoNet-4stage refinement rowpack=4",
           lambda: bench_model("StereoNet/scene_flow_8x_4stage", args.iters,
                               **{"model.disp_refinement.pack": 4}))
    record("PSMNet backbone rowpack off",
           lambda: bench_model("PSMNet/scene_flow", args.iters,
                               **{"model.backbone.pack": 1}))
    record("PSMNet backbone rowpack=4",
           lambda: bench_model("PSMNet/scene_flow", args.iters,
                               **{"model.backbone.pack": 4}))
    record("AcfNet-adaptive baseline",
           lambda: bench_model("AcfNet/scene_flow_adaptive", args.iters))

    def acf_pallas():
        c3.set_packed_schedules(s1="pallas")
        try:
            return bench_model("AcfNet/scene_flow_adaptive", args.iters)
        finally:
            c3.set_packed_schedules(s1="auto")
    record("AcfNet-adaptive s1=pallas", acf_pallas)

    print("\ndecision: enable winners in configs/ and, if pallas wins, "
          "flip set_packed_schedules(s1=) default for TPU in ops/conv3d.py")


if __name__ == "__main__":
    main()
