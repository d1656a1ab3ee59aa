#!/usr/bin/env python
"""xplane-trace a model's jitted forward (the round-2 DeepPruner recipe).

Traces N forwards with distinct device-staged inputs, writes the trace to
--out, and prints the top self-time ops parsed from the xplane proto (no
tensorboard needed: uses jax's xplane pb + a tiny reader).

Usage: python tools/profile_model.py --config DeepPruner/scene_flow_4x \
           [--height 384 --width 1280] [--iters 3] [--out /tmp/xplane]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xplane(logdir, top=40):
    """Aggregate per-op self time from the xplane.pb TPU op trace."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    # the proto bindings ship inside the baked tensorflow wheel
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        print("xplane proto bindings unavailable; trace left at", paths[-1])
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fp:
        space.ParseFromString(fp.read())
    totals = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'op':70s} {'ms':>9s}")
    for name, ps in rows:
        print(f"{name[:70]:70s} {ps / 1e9:9.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="DeepPruner/scene_flow_4x")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/xplane_trace")
    ap.add_argument("--set", action="append", default=[],
                    help="config override key=value (value eval'd as "
                         "Python literal; e.g. --set model.cost_processor."
                         "cost_aggregator.phase_argmin=True)")
    ap.add_argument("--summarize-only", action="store_true",
                    help="just parse an existing trace dir")
    ap.add_argument("--train", action="store_true",
                    help="trace the FULL train step (forward + losses + "
                         "grads + optimizer + BN stats) instead of the "
                         "eval forward — the TPU-hours actually go here "
                         "(VERDICT r4 #4: AcfNet/DeepPruner rooflines)")
    ap.add_argument("--batch", type=int, default=3,
                    help="train-mode batch size (reference imgs_per_gpu)")
    args = ap.parse_args()

    if args.summarize_only:
        summarize_xplane(args.out)
        return

    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model

    import ast
    overrides = {"model.dtype": args.dtype}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    cfg = get_config(args.config, **overrides)
    model = build_model(cfg)
    out_key = "flows" if cfg.get("task") == "flow" else "disps"
    h, w = args.height, args.width
    if args.train:
        _trace_train(args, cfg, model, h, w)
        return
    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r,
                                           train=False)[out_key][0])
    keys = jax.random.split(jax.random.PRNGKey(1), 2 * args.iters)
    frames = [(jax.device_put(jax.random.normal(keys[2 * i], (1, h, w, 3))),
               jax.device_put(jax.random.normal(keys[2 * i + 1],
                                                (1, h, w, 3))))
              for i in range(args.iters)]
    jax.block_until_ready(frames)
    fwd(*frames[0]).block_until_ready()  # compile

    jax.profiler.start_trace(args.out)
    outs = [fwd(l, r) for l, r in frames]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    print("trace ->", args.out)
    summarize_xplane(args.out)


def _trace_train(args, cfg, model, h, w):
    """Trace args.iters full train steps with distinct staged batches."""
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.losses import make_loss_evaluator
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer,
                                                    make_train_step)

    b = args.batch
    rng = np.random.RandomState(0)

    def mk_batch(i):
        r = np.random.RandomState(100 + i)
        return {
            "leftImage": jax.device_put(jnp.asarray(
                r.rand(b, h, w, 3), jnp.float32)),
            "rightImage": jax.device_put(jnp.asarray(
                r.rand(b, h, w, 3), jnp.float32)),
            "leftDisp": jax.device_put(jnp.asarray(
                r.rand(b, h, w, 1) * 180 + 1, jnp.float32)),
        }

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        jnp.asarray(rng.rand(b, h, w, 3), jnp.float32), train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    evaluator = make_loss_evaluator(
        cfg["model"]["losses"], sparse=False,
        cmn_losses_cfg=cfg["model"].get("cmn", {}).get("losses"))
    step = make_train_step(model, tx, evaluator, donate=False)
    batches = [mk_batch(i) for i in range(args.iters)]
    jax.block_until_ready(batches)
    state, m = step(state, batches[0])   # compile
    float(m["loss"])

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for bt in batches:
        state, m = step(state, bt)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    jax.profiler.stop_trace()
    print(f"train step {dt*1e3:.1f} ms (b{b}, {args.dtype}); "
          f"trace -> {args.out}")
    summarize_xplane(args.out)


if __name__ == "__main__":
    main()
