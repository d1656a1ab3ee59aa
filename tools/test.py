#!/usr/bin/env python
"""Evaluate a trained model over a test set; optionally save results.

Parity target: reference tools/test.py:211-333 — per-sample evaluation
(EPE / n-px / occlusion split), pandas-style metric table, optional KITTI
submission output via SaveResultTool.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a dense matching model")
    p.add_argument("--config", required=True)
    p.add_argument("--work-dir", required=True,
                   help="dir containing checkpoints/ (from train.py)")
    p.add_argument("--data-root", default=None)
    p.add_argument("--annfile", default=None)
    p.add_argument("--out-dir", default=None,
                   help="save disp_0/ (KITTI submission) + color maps here")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--override", nargs="*", default=[])
    from densematchingbenchmark_tpu.parallel import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def _flow_main(args, cfg):
    """Flow-task eval branch: EPE/n-px over the test set + optional .flo +
    color-wheel dumps (reference flow eval_hooks/save_result analogs)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from densematchingbenchmark_tpu.flow.models import build_flow_model
    from densematchingbenchmark_tpu.flow.trainer import evaluate_flow
    from densematchingbenchmark_tpu.flow import transforms as ftrans
    from densematchingbenchmark_tpu.flow.datasets import (
        FlyingChairsDataset, SyntheticFlowDataset)
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer)
    from densematchingbenchmark_tpu.utils.checkpoint import CheckpointManager
    from densematchingbenchmark_tpu.data.loader import collate

    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    crop = tuple(cfg["data"].get("crop_size", (320, 448)))
    pad = tuple(cfg["data"].get("pad_to_size", (384, 512)))
    if args.synthetic:
        ds = SyntheticFlowDataset(
            length=4, height=crop[0], width=crop[1],
            transform=ftrans.make_eval_transform(crop, mean, std))
    else:
        cfg["data"]["data_root"] = args.data_root
        ds = FlyingChairsDataset(
            args.annfile, args.data_root,
            transform=ftrans.make_eval_transform(pad, mean, std))

    model = build_flow_model(cfg)
    h, w = ds[0]["leftImage"].shape[:2]
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=1)
    template = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    state, _ = CheckpointManager(args.work_dir).restore(template)
    if state is None:
        print("WARNING: no checkpoint found, evaluating random init")
        state = template
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    results, n = evaluate_flow(
        model, variables, ds,
        sparse=cfg["model"].get("eval", {}).get("sparse", False))
    print(f"evaluated {n} samples:")
    for k in sorted(results):
        print(f"  {k:12s} {results[k]:.4f}")

    if args.out_dir:
        from densematchingbenchmark_tpu.flow.vis import SaveFlowResultTool
        save = SaveFlowResultTool(args.out_dir)
        step = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
        for i in range(len(ds)):
            batch = collate([ds[i]])
            out = step(variables, batch["leftImage"], batch["rightImage"])
            save(f"{i:06d}", np.asarray(out["flows"][0]))
        print(f"results saved to {args.out_dir}")


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # Multi-host eval: each process evaluates its stride-shard of the test
    # set, metrics are allgathered (reference tools/test.py uses the same
    # init_dist + stride-shard + collect pattern).
    from densematchingbenchmark_tpu.parallel import init_distributed
    init_distributed(args.launcher, args.coordinator, args.num_processes,
                     args.process_id)

    import numpy as np
    import jax

    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.data import (build_dataset, transforms,
                                                 SyntheticStereoDataset)
    from densematchingbenchmark_tpu.evaluation.eval_loop import evaluate
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer)
    from densematchingbenchmark_tpu.utils.checkpoint import CheckpointManager

    overrides = {}
    for item in args.override:
        key, val = item.split("=", 1)
        try:
            import ast
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        overrides[key] = val
    cfg = get_config(args.config, **overrides)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]

    if cfg.get("task") == "flow":
        _flow_main(args, cfg)
        return

    if args.synthetic:
        maxd = cfg["model"]["max_disp"]
        ds = SyntheticStereoDataset(length=4, height=256, width=512,
                                    max_disp=min(maxd, 64))
        ds.transform = transforms.make_eval_transform((256, 512), mean, std)
    else:
        cfg["data"]["data_root"] = args.data_root
        cfg["data"]["test"]["annfile"] = args.annfile
        ds = build_dataset(cfg["data"], "test",
                           transform=transforms.make_eval_transform(
                               cfg["data"]["test"]["input_shape"],
                               mean, std))

    model = build_model(cfg)
    sample = ds[0]
    import jax.numpy as jnp
    h, w = sample["leftImage"].shape[:2]
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)

    tx, _ = build_optimizer(cfg, steps_per_epoch=1)
    template = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    state, _ = CheckpointManager(args.work_dir).restore(template)
    if state is None:
        print("WARNING: no checkpoint found, evaluating random init")
        state = template
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    results, n = evaluate(model, variables, ds, cfg["model"].get("eval", {}),
                          cfg.get("eval_disparity_id", (0,)),
                          num_shards=jax.process_count(),
                          shard_id=jax.process_index())
    if jax.process_count() > 1:
        from densematchingbenchmark_tpu.evaluation.format import (
            combine_shard_metrics)
        results, n = combine_shard_metrics(results, n)
        if jax.process_index() != 0:
            return
    print(f"evaluated {n} samples:")
    for k in sorted(results):
        print(f"  {k:24s} {results[k]:.4f}")

    has_conf = cfg["model"].get("cmn") is not None
    if args.out_dir or has_conf:
        from densematchingbenchmark_tpu.visualization import SaveResultTool
        from densematchingbenchmark_tpu.trainer import make_eval_step
        from densematchingbenchmark_tpu.data.loader import collate
        save = SaveResultTool(args.out_dir) if args.out_dir else None
        step = make_eval_step(model)
        spars_sums, spars_n = {}, 0
        for i in range(len(ds)):
            batch = collate([ds[i]])
            out = step(state, {k: batch[k]
                               for k in ("leftImage", "rightImage")})
            if save is not None:
                save(f"{i:06d}", np.asarray(out["disps"][0]),
                     batch.get("leftDisp"),
                     batch["leftImage"] * np.asarray(std) + np.asarray(mean))
            if "confs" in out and batch.get("leftDisp") is not None:
                # confidence quality: sparsification curves averaged over
                # the test set (reference tools/test.py:150-157) +
                # histogram/map dumps (eval_hooks.py:211-241)
                from densematchingbenchmark_tpu.evaluation import (
                    sparsification)
                ecfg = cfg["model"].get("eval", {})
                sp = sparsification.sparsification_plot(
                    np.asarray(out["disps"][0]),
                    np.asarray(batch["leftDisp"]),
                    np.asarray(out["confs"][0]),
                    lb=ecfg.get("lower_bound", 0),
                    ub=ecfg.get("upper_bound", 192), seed=i)
                for k, v in sp.items():
                    spars_sums[k] = spars_sums.get(k, 0.0) + v
                spars_n += 1
                if save is not None:
                    from imageio.v2 import imwrite
                    from densematchingbenchmark_tpu.visualization import (
                        show_result)
                    conf_dir = os.path.join(args.out_dir, "confidence")
                    os.makedirs(conf_dir, exist_ok=True)
                    conf = np.clip(
                        np.asarray(out["confs"][0])[0, ..., 0], 0, 1)
                    imwrite(os.path.join(conf_dir, f"{i:06d}.png"),
                            (conf * 255).astype(np.uint8))
                    hist = show_result.hist_to_vis(
                        show_result.conf_to_hist(conf))
                    imwrite(os.path.join(conf_dir, f"{i:06d}_hist.png"),
                            np.clip(hist, 0, 255).astype(np.uint8))
        if spars_n:
            print(f"sparsification ({spars_n} samples, EPE after removing "
                  f"least-confident X%):")
            pcts = sorted({int(k.split('_')[-1]) for k in spars_sums})
            for series in ("est", "oracle", "random"):
                row = " ".join(f"{spars_sums[f'{series}_{p}']/spars_n:7.3f}"
                               for p in pcts if f"{series}_{p}" in spars_sums)
                print(f"  {series:7s} {row}")
        if args.out_dir:
            print(f"results saved to {args.out_dir}")


if __name__ == "__main__":
    main()
