#!/usr/bin/env python
"""Run stereo inference on a directory of image pairs.

Parity target: reference tools/demo.py + dmb/apis/inference.py:61-225
(init_model / inference_stereo): loads left/right pairs, pads to a
model-friendly shape, runs the model, writes disparity maps (.pfm + color
PNG) per pair.

Expected layout: <data-dir>/left/*.png and <data-dir>/right/*.png with
matching filenames (the reference's demo contract).
"""

import argparse
import glob
import os
import os.path as osp
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Stereo inference demo")
    p.add_argument("--config", required=True)
    p.add_argument("--data-dir", required=True,
                   help="directory with left/ and right/ subdirs")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--work-dir", default=None,
                   help="checkpoint dir; random init if absent")
    p.add_argument("--pad-to", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="pad input to this shape (default: next multiple "
                        "of 64)")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.data import io, transforms
    from densematchingbenchmark_tpu.evaluation import remove_padding
    from densematchingbenchmark_tpu.visualization import disp_to_color

    cfg = get_config(args.config)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]

    lefts = sorted(glob.glob(osp.join(args.data_dir, "left", "*")))
    assert lefts, f"no images under {args.data_dir}/left"

    if cfg.get("task") == "flow":
        # flow demo: frame pairs -> .flo + color-wheel PNG per pair
        from densematchingbenchmark_tpu.apis import (init_flow_model,
                                                     inference_flow)
        from densematchingbenchmark_tpu.flow.vis import SaveFlowResultTool
        model = init_flow_model(cfg, checkpoint_dir=args.work_dir)
        save = SaveFlowResultTool(args.out_dir)
        os.makedirs(args.out_dir, exist_ok=True)
        for lpath in lefts:
            rpath = osp.join(args.data_dir, "right", osp.basename(lpath))
            left, right = io.load_image(lpath), io.load_image(rpath)
            h, w = left.shape[:2]
            th, tw = args.pad_to or (((h + 63) // 64) * 64,
                                     ((w + 63) // 64) * 64)
            res = inference_flow(
                model, [{"leftImage": left, "rightImage": right}],
                pad_to_shape=(th, tw))
            name = osp.splitext(osp.basename(lpath))[0]
            save(name, res[0]["flows"][0])
            print(f"{name}: flow saved")
        print(f"results in {args.out_dir}")
        return

    model = build_model(cfg)
    variables = None
    forward = None
    os.makedirs(args.out_dir, exist_ok=True)

    for lpath in lefts:
        rpath = osp.join(args.data_dir, "right", osp.basename(lpath))
        left = io.load_image(lpath)
        right = io.load_image(rpath)
        h, w = left.shape[:2]
        if args.pad_to:
            th, tw = args.pad_to
        else:
            th, tw = ((h + 63) // 64) * 64, ((w + 63) // 64) * 64
        sample = transforms.pad_to(
            {"leftImage": left, "rightImage": right}, (th, tw))
        sample = transforms.normalize(sample, mean, std)
        li = jnp.asarray(sample["leftImage"])[None]
        ri = jnp.asarray(sample["rightImage"])[None]

        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), li, ri,
                                   train=False)
            if args.work_dir:
                from densematchingbenchmark_tpu.trainer import (
                    TrainState, build_optimizer)
                from densematchingbenchmark_tpu.utils.checkpoint import (
                    CheckpointManager)
                tx, _ = build_optimizer(cfg, steps_per_epoch=1)
                template = TrainState.create(variables, tx,
                                             jax.random.PRNGKey(0))
                state, _ = CheckpointManager(args.work_dir).restore(template)
                if state is not None:
                    variables = {"params": state.params,
                                 "batch_stats": state.batch_stats}
            forward = jax.jit(lambda l, r: model.apply(
                variables, l, r, train=False)["disps"][0])

        disp = remove_padding(np.asarray(forward(li, ri)), h, w)[0, ..., 0]
        name = osp.splitext(osp.basename(lpath))[0]
        io.save_pfm(osp.join(args.out_dir, f"{name}.pfm"), disp)
        from imageio.v2 import imwrite
        imwrite(osp.join(args.out_dir, f"{name}.png"),
                np.clip(disp_to_color(disp, cfg["model"]["max_disp"]),
                        0, 255).astype(np.uint8))
        print(f"{name}: disp range [{disp.min():.2f}, {disp.max():.2f}] "
              f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
