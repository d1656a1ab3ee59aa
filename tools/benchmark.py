#!/usr/bin/env python
"""Full benchmark harness: params / FLOPs / latency / FPS for the model zoo.

Parity target: the reference's FLOPs+FPS tables (README "Experiment
Results", produced by thop.profile + CUDA-timed loops in
tests/modeling/stereo/models/test_model.py:73-106). Here FLOPs come from
XLA's compiled cost analysis and latency from device-synchronized timing.

bench.py (repo root) stays the driver's single-line PSMNet metric; this
tool prints the whole table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINES_FPS = {  # GTX1080Ti, BASELINE.md
    "PSMNet/scene_flow": 1.67,
    "AcfNet/scene_flow_adaptive": 1.38,
    "AcfNet/scene_flow_uniform": 1.66,
    "StereoNet/scene_flow_8x_2stage": 19.17,
    "StereoNet/scene_flow_8x_4stage": 8.54,
    "DeepPruner/scene_flow_4x": 3.42,
    "DeepPruner/scene_flow_8x": 7.67,
    "GCNet/scene_flow": None,
    "AnyNet/scene_flow": None,
    # flow family — no reference baseline (its flow registry is empty)
    "PWCFlow/flying_chairs": None,
    "RAFT/flying_chairs": None,
}


def bench_one(name, h, w, dtype, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    cfg = get_config(name, **{"model.dtype": dtype})
    model = build_model(cfg)
    out_key = "flows" if cfg.get("task") == "flow" else "disps"
    left = jnp.zeros((1, h, w, 3), jnp.float32)
    # init at a small spatial shape (params/stats are shape-independent):
    # full-res eager init can OOM (unfused 1-channel intermediates)
    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))

    fwd = jax.jit(lambda l, r: model.apply(variables, l, r,
                                           train=False)[out_key][0])
    lowered = fwd.lower(left, left)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops") if cost else None

    # Distinct device-staged frames per iteration (DESIGN.md §3: identical
    # zero inputs are not trustworthy over the axon tunnel; same harness as
    # bench.py).
    keys = jax.random.split(jax.random.PRNGKey(1), 2 * iters)
    frames = [
        (jax.device_put(jax.random.normal(keys[2 * i], left.shape)),
         jax.device_put(jax.random.normal(keys[2 * i + 1], left.shape)))
        for i in range(iters)
    ]
    jax.block_until_ready(frames)
    fwd(*frames[0]).block_until_ready()
    fwd(*frames[1]).block_until_ready()
    t0 = time.perf_counter()
    outs = [fwd(l, r) for l, r in frames]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / iters * 1000
    return dict(model=name, params_m=round(n_params / 1e6, 3),
                gflops=round(flops / 1e9, 1) if flops else None,
                latency_ms=round(ms, 1), fps=round(1000 / ms, 2),
                vs_baseline=(round(1000 / ms / BASELINES_FPS[name], 2)
                             if BASELINES_FPS.get(name) else None))


def bench_train(name, h, w, batch, dtype, iters):
    """Training step throughput (forward+loss+grad+update, samples/s)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.losses import make_loss_evaluator
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer,
                                                    make_train_step)

    cfg = get_config(name, **{"model.dtype": dtype})
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch_data = {
        "leftImage": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
        "rightImage": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
        "leftDisp": jnp.asarray(rng.rand(batch, h, w, 1) * 180 + 1,
                                jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch_data["leftImage"],
                           batch_data["rightImage"], train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    evaluator = make_loss_evaluator(
        cfg["model"]["losses"], sparse=False,
        cmn_losses_cfg=cfg["model"].get("cmn", {}).get("losses"))
    step = make_train_step(model, tx, evaluator, donate=False)
    state, m = step(state, batch_data)
    float(m["loss"])  # force materialization of the full step chain
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_data)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000
    return dict(model=name, mode="train", batch=batch,
                step_ms=round(ms, 1),
                samples_per_s=round(batch * 1000 / ms, 2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=list(BASELINES_FPS))
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--train", action="store_true",
                   help="benchmark the training step instead of inference")
    p.add_argument("--batch", type=int, default=3,
                   help="training batch size (reference trains 3/GPU)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json", action="store_true")
    p.add_argument("--out", default=None,
                   help="write the rows as a JSON artifact (e.g. "
                        "ZOO_BENCH_r05.json) so per-family perf is tracked "
                        "round-over-round")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    rows = []
    for name in args.models:
        # the reference benches DeepPruner at 384x1280 (ResultOfDeepPruner.md
        # "Model Info"); its Fast backbone needs W % 32 == 0
        width = 1280 if name.startswith("DeepPruner") and args.width == 1248 \
            else args.width
        if name.startswith("PWCFlow") and args.width == 1248:
            width = 1280  # flow pyramid needs W % 16 == 0
        try:
            if args.train:
                row = bench_train(name, args.height, width, args.batch,
                                  args.dtype, args.iters)
            else:
                row = bench_one(name, args.height, width, args.dtype,
                                args.iters)
        except Exception as e:  # keep benching the rest
            row = dict(model=name, error=f"{type(e).__name__}: {e}")
        rows.append(row)
        print(json.dumps(row))

    if args.out:
        meta = dict(height=args.height, width=args.width, dtype=args.dtype,
                    iters=args.iters,
                    mode="train" if args.train else "inference")
        with open(args.out, "w") as fp:
            json.dump(dict(meta=meta, rows=rows), fp, indent=1)

    if not args.json and not args.train:
        print(f"\n{'model':34s} {'params':>8s} {'GFLOPs':>9s} "
              f"{'ms':>7s} {'FPS':>7s} {'vs ref':>7s}")
        for r in rows:
            if "error" in r:
                print(f"{r['model']:34s} ERROR {r['error'][:60]}")
                continue
            print(f"{r['model']:34s} {r['params_m']:>7.3f}M "
                  f"{(r['gflops'] or 0):>9.1f} {r['latency_ms']:>7.1f} "
                  f"{r['fps']:>7.2f} "
                  f"{('%.2fx' % r['vs_baseline']) if r['vs_baseline'] else '--':>7s}")


if __name__ == "__main__":
    main()
