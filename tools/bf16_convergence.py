#!/usr/bin/env python
"""bf16-vs-f32 training convergence study (VERDICT r2 missing #2 / next #5).

Trains the same model twice on the identical deterministic synthetic
stream — once with model.dtype=float32, once bfloat16 (f32 params, bf16
compute; bf16 shares f32's exponent range so no loss scaling) — and
reports the loss curves, the relative divergence, and the per-step time.

Role parity: apex amp O1 in the reference (dmb/apis/train.py:104-108),
whose credibility was likewise a "loss still converges" argument.

Usage: python tools/bf16_convergence.py [--steps 500] [--config NAME]
       [--height 256 --width 512] [--cpu]
Prints one JSON line with the curves + summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(cfg_name, dtype, steps, height, width, batch, log_every):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.losses import make_loss_evaluator
    from densematchingbenchmark_tpu.data import (SyntheticStereoDataset,
                                                 transforms)
    from densematchingbenchmark_tpu.data.loader import collate
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer,
                                                    make_train_step)

    cfg = get_config(cfg_name, **{"model.dtype": dtype})
    maxd = min(cfg["model"]["max_disp"], 64)
    model = build_model(cfg)
    ds = SyntheticStereoDataset(length=64, height=height, width=width,
                                max_disp=maxd)
    ds.transform = transforms.make_train_transform(
        (height, width), cfg["data"]["mean"], cfg["data"]["std"])

    dummy = jnp.zeros((batch, height, width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=steps)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    evaluator = make_loss_evaluator(
        cfg["model"]["losses"], sparse=False,
        cmn_losses_cfg=cfg["model"].get("cmn", {}).get("losses"))
    step = make_train_step(model, tx, evaluator)

    def batch_at(i):
        rng = np.random.default_rng
        samples = [ds.__getitem__((i * batch + j) % len(ds),
                                  rng=rng((0, i, j)))
                   for j in range(batch)]
        b = collate(samples)
        return {k: jnp.asarray(b[k])
                for k in ("leftImage", "rightImage", "leftDisp")}

    curve = []
    t_total, timed_steps = 0.0, 0
    for i in range(steps):
        b = batch_at(i)
        t0 = time.perf_counter()
        state, metrics = step(state, b)
        loss = float(metrics["loss"])  # sync
        dt = time.perf_counter() - t0
        if i >= 2:  # skip compile + first steady step
            t_total += dt
            timed_steps += 1
        if i % log_every == 0 or i == steps - 1:
            curve.append((i, round(loss, 5)))
    return curve, (t_total / max(timed_steps, 1)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="PSMNet/scene_flow")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    out = {"config": args.config, "steps": args.steps,
           "shape": [args.height, args.width], "batch": args.batch}
    for dtype in ("float32", "bfloat16"):
        curve, step_ms = run(args.config, dtype, args.steps, args.height,
                             args.width, args.batch, args.log_every)
        out[dtype] = {"curve": curve, "step_ms": round(step_ms, 2),
                      "final_loss": curve[-1][1]}
        print(f"# {dtype}: final loss {curve[-1][1]:.4f}, "
              f"step {step_ms:.1f} ms", file=sys.stderr)

    f32, bf16 = out["float32"], out["bfloat16"]
    # compare the tail (last quarter) where curves should have settled
    tail = max(1, len(f32["curve"]) // 4)
    tail_f32 = [v for _, v in f32["curve"][-tail:]]
    tail_bf16 = [v for _, v in bf16["curve"][-tail:]]
    mean = lambda xs: sum(xs) / len(xs)
    out["tail_rel_diff"] = round(
        abs(mean(tail_bf16) - mean(tail_f32)) / max(abs(mean(tail_f32)),
                                                    1e-9), 4)
    out["speedup"] = round(f32["step_ms"] / bf16["step_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
