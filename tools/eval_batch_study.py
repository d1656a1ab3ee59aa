#!/usr/bin/env python
"""Batched-eval wall-clock study (VERDICT r2 next #8).

Evaluates a synthetic SceneFlow-like set through evaluation.eval_loop at
batch 1 vs batch N (shape-bucketed path) and reports wall-clock + metric
equality. The per-sample loop pays one dispatch + one device_get per
sample; batching amortizes both.

Usage: python tools/eval_batch_study.py [--config StereoNet/...]
       [--n 64] [--batches 1 4 8] [--height 384 --width 1248]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="StereoNet/scene_flow_8x_2stage")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 4, 8])
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1248)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cache", action="store_true",
                    help="preload all samples (removes host decode cost)")
    ap.add_argument("--device-resident", action="store_true",
                    help="pre-stage every batch on device and time only "
                         "the step+device_get loop — isolates the "
                         "dispatch/readback amortization (on this dev "
                         "machine H2D rides a network tunnel and would "
                         "otherwise dominate; real hosts use PCIe DMA)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.data import (SyntheticStereoDataset,
                                                 transforms)
    from densematchingbenchmark_tpu.evaluation.eval_loop import (
        evaluate, make_eval_metrics_step)

    cfg = get_config(args.config, **{"model.dtype": args.dtype})
    model = build_model(cfg)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    maxd = min(cfg["model"]["max_disp"], 64)
    ds = SyntheticStereoDataset(length=args.n, height=args.height,
                                width=args.width, max_disp=maxd)
    ds.transform = transforms.make_eval_transform(
        (args.height, args.width), mean, std)
    if args.cache:
        cached = [ds[i] for i in range(len(ds))]

        class Cached:
            def __len__(self):
                return len(cached)

            def __getitem__(self, i, rng=None):
                return cached[i]

        ds = Cached()
    small = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)
    eval_cfg = cfg["model"].get("eval", {})

    results = {}
    for bsz in args.batches:
        step = make_eval_metrics_step(
            model, eval_cfg.get("lower_bound", 0),
            eval_cfg.get("upper_bound", 192), (0,), False)
        if args.device_resident:
            import numpy as np
            from densematchingbenchmark_tpu.data.loader import collate
            dev_batches = []
            for i0 in range(0, args.n, bsz):
                samples = [ds[i] for i in range(i0, min(i0 + bsz, args.n))]
                b = collate(samples)
                dev_batches.append({k: jax.device_put(v)
                                    for k, v in b.items()
                                    if k != "original_size"})
            jax.block_until_ready(dev_batches)
            for b in dev_batches[:2]:
                jax.block_until_ready(step(variables, b))  # compile
            t0 = time.perf_counter()
            sums, count = {}, 0
            pending = [step(variables, b) for b in dev_batches]  # async
            for res in pending:
                res = jax.device_get(res)
                for did, m in res.items():
                    for k, v in m.items():
                        sums[f"disp_{did}/{k}"] = \
                            sums.get(f"disp_{did}/{k}", 0.0) + float(
                                np.sum(v))
            count = args.n
            dt = time.perf_counter() - t0
            r = {k: v / count for k, v in sums.items()}
        else:
            # warm: compile outside the timed window (full + tail size)
            evaluate(model, variables, ds, eval_cfg, batch_size=bsz,
                     step=step)
            t0 = time.perf_counter()
            r, n = evaluate(model, variables, ds, eval_cfg, batch_size=bsz,
                            step=step)
            dt = time.perf_counter() - t0
        results[bsz] = (dt, r, args.n)
        print(f"batch {bsz}: {dt*1e3:8.1f} ms total, "
              f"{dt/args.n*1e3:6.2f} ms/sample, epe={r['disp_0/epe']:.4f}",
              flush=True)

    b0 = args.batches[0]
    out = {"config": args.config, "n": args.n,
           "shape": [args.height, args.width]}
    for bsz in args.batches:
        dt, r, n = results[bsz]
        out[f"batch{bsz}_ms_per_sample"] = round(dt / args.n * 1e3, 2)
        out[f"batch{bsz}_epe"] = round(r["disp_0/epe"], 5)
    out["speedup"] = round(results[b0][0] / results[args.batches[-1]][0], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
