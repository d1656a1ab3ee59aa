#!/usr/bin/env python
"""Train a stereo model from a named config.

Parity target: tools/train.py in the reference (argparse -> config ->
build model/datasets -> train_matcher), TPU-native: no launcher, one
process drives the device mesh.

Examples:
  python tools/train.py --config PSMNet/scene_flow \\
      --data-root /data/SceneFlow --annfile /data/ann/cleanpass_train.json \\
      --eval-annfile /data/ann/cleanpass_test.json --work-dir work/psmnet
  python tools/train.py --config PSMNet/scene_flow --synthetic \\
      --work-dir /tmp/smoke --max-steps 20       # smoke run, no dataset
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a dense matching model")
    p.add_argument("--config", required=True,
                   help="config name, e.g. PSMNet/scene_flow")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--annfile", default=None, help="train annotation JSON")
    p.add_argument("--eval-annfile", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (smoke/debug)")
    p.add_argument("--synthetic-shape", type=int, nargs=2, default=(256, 512),
                   metavar=("H", "W"))
    p.add_argument("--synthetic-length", type=int, default=16)
    p.add_argument("--synthetic-eval", type=int, default=0, metavar="N",
                   help="with --synthetic: also run the per-epoch "
                        "process-sharded eval on N synthetic samples")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--override", nargs="*", default=[],
                   help="dotted config overrides, e.g. model.max_disp=96")
    p.add_argument("--profile", default=None, metavar="START:STOP",
                   help="JAX-profiler-trace global steps START..STOP "
                        "(e.g. 5:8) to <work-dir>/profile")
    from densematchingbenchmark_tpu.parallel import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # Multi-host: connect to the coordinator BEFORE any backend use
    # (reference init_dist, dmb/utils/env.py:16-53; here the mesh then
    # spans all hosts and the loader shards by jax.process_index()).
    from densematchingbenchmark_tpu.parallel import init_distributed
    init_distributed(args.launcher, args.coordinator, args.num_processes,
                     args.process_id)

    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.trainer.loop import train_matcher

    overrides = {}
    for item in args.override:
        key, val = item.split("=", 1)
        try:
            import ast
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        overrides[key] = val
    if args.dtype:
        overrides["model.dtype"] = args.dtype
    cfg = get_config(args.config, **overrides)
    cfg["seed"] = args.seed
    profile_steps = None
    if args.profile:
        start, _, stop = args.profile.partition(":")
        profile_steps = (int(start), int(stop or start))

    if cfg.get("task") == "flow":
        # flow branch: PWCFlow etc. through the flow trainer (the
        # reference cannot train flow at all — empty flow registry)
        from densematchingbenchmark_tpu.flow.trainer import train_flow
        from densematchingbenchmark_tpu.flow import transforms as ftrans
        from densematchingbenchmark_tpu.flow.datasets import (
            FlyingChairsDataset, SyntheticFlowDataset)
        mean, std = cfg["data"]["mean"], cfg["data"]["std"]
        crop = tuple(cfg["data"].get("crop_size", (320, 448)))
        pad = tuple(cfg["data"].get("pad_to_size", (384, 512)))
        if args.synthetic:
            train_ds = SyntheticFlowDataset(
                length=16, height=crop[0], width=crop[1],
                transform=ftrans.make_train_transform(crop, mean, std))
            eval_ds = SyntheticFlowDataset(
                length=2, height=crop[0], width=crop[1],
                transform=ftrans.make_eval_transform(crop, mean, std))
        else:
            assert args.data_root and args.annfile, \
                "--data-root and --annfile required (or use --synthetic)"
            train_ds = FlyingChairsDataset(
                args.annfile, args.data_root,
                transform=ftrans.make_train_transform(crop, mean, std))
            eval_ds = None
            if args.eval_annfile:
                eval_ds = FlyingChairsDataset(
                    args.eval_annfile, args.data_root,
                    transform=ftrans.make_eval_transform(pad, mean, std))
        train_flow(cfg, args.work_dir, train_dataset=train_ds,
                   eval_dataset=eval_ds, vis_dataset=eval_ds,
                   resume=args.resume, max_steps=args.max_steps)
        return

    if args.synthetic:
        maxd = cfg["model"]["max_disp"]
        sh, sw = args.synthetic_shape
        slen = args.synthetic_length
        cfg["data"] = dict(
            type="Synthetic", sparse=False, batch_size_per_device=1,
            mean=cfg["data"]["mean"], std=cfg["data"]["std"],
            train=dict(length=slen, height=sh, width=sw,
                       max_disp=min(maxd, 64), input_shape=(sh, sw)),
        )
        from densematchingbenchmark_tpu.data import (SyntheticStereoDataset,
                                                     transforms)
        ds = SyntheticStereoDataset(length=slen, height=sh, width=sw,
                                    max_disp=min(maxd, 64))
        ds.transform = transforms.make_train_transform(
            (sh, sw), cfg["data"]["mean"], cfg["data"]["std"])
        eval_ds = None
        if args.synthetic_eval:
            # exercises the stride-sharded eval loop + metric allgather
            # (evaluation/eval_loop.py + combine_shard_metrics) on every
            # process of a multi-host launch
            eval_ds = SyntheticStereoDataset(
                length=args.synthetic_eval, height=sh, width=sw,
                max_disp=min(maxd, 64), seed=7)
            eval_ds.transform = transforms.make_eval_transform(
                (sh, sw), cfg["data"]["mean"], cfg["data"]["std"])
            cfg["model"].setdefault(
                "eval", dict(lower_bound=0, upper_bound=maxd))
        train_matcher(cfg, args.work_dir, train_dataset=ds,
                      eval_dataset=eval_ds,
                      resume=args.resume, max_steps=args.max_steps,
                      log_interval=args.log_interval,
                      profile_steps=profile_steps)
        return

    assert args.data_root and args.annfile, \
        "--data-root and --annfile required (or use --synthetic)"
    cfg["data"]["data_root"] = args.data_root
    cfg["data"]["train"]["annfile"] = args.annfile
    if args.eval_annfile:
        cfg["data"]["eval"]["annfile"] = args.eval_annfile
    train_matcher(cfg, args.work_dir, resume=args.resume,
                  max_steps=args.max_steps, log_interval=args.log_interval,
                  profile_steps=profile_steps)


if __name__ == "__main__":
    main()
