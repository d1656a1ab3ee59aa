#!/usr/bin/env python
"""Cost-volume inspector: plot per-pixel cost/probability distributions.

Parity target: reference tools/view_cost.py + tools/UI.py (PyQt5 click UI).
TPU-native headless version: runs a model on an image pair (or synthetic
data), picks pixels (given or random), and writes per-pixel cost
distribution plots (softmax over disparity, GT marker) as PNGs — the same
diagnostic the reference's click-UI shows, usable over SSH.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Inspect cost distributions")
    p.add_argument("--config", required=True)
    p.add_argument("--work-dir", default=None, help="checkpoint dir")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--pixels", nargs="*", default=None,
                   help="pixels to inspect as y,x pairs, e.g. 120,340")
    p.add_argument("--num-random", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--override", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.data import (SyntheticStereoDataset,
                                                 transforms)

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
    maxd = cfg["model"]["max_disp"]

    ds = SyntheticStereoDataset(length=1, height=256, width=512,
                                max_disp=min(maxd, 64))
    sample = ds[0]
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    norm = transforms.normalize(sample, mean, std)

    model = build_model(cfg)
    li = jnp.asarray(norm["leftImage"])[None]
    ri = jnp.asarray(norm["rightImage"])[None]
    variables = model.init(jax.random.PRNGKey(0), li, ri, train=False)
    if args.work_dir:
        from densematchingbenchmark_tpu.trainer import (TrainState,
                                                        build_optimizer)
        from densematchingbenchmark_tpu.utils.checkpoint import (
            CheckpointManager)
        tx, _ = build_optimizer(cfg, steps_per_epoch=1)
        template = TrainState.create(variables, tx, jax.random.PRNGKey(0))
        state, _ = CheckpointManager(args.work_dir).restore(template)
        if state is not None:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

    out = model.apply(variables, li, ri, train=False)
    assert out.get("costs"), "model returned no cost volumes to inspect"
    cost = np.asarray(out["costs"][0])[0]          # [D, H, W]
    disp = np.asarray(out["disps"][0])[0, ..., 0]
    gt = sample.get("leftDisp")
    d_axis = np.arange(cost.shape[0])

    h, w = disp.shape
    if args.pixels:
        pixels = [tuple(map(int, p.split(","))) for p in args.pixels]
    else:
        rng = np.random.RandomState(0)
        pixels = [(int(rng.randint(h // 4, 3 * h // 4)),
                   int(rng.randint(w // 4, 3 * w // 4)))
                  for _ in range(args.num_random)]

    os.makedirs(args.out_dir, exist_ok=True)
    for y, x in pixels:
        c = cost[:, y, x]
        prob = np.exp(c - c.max())
        prob /= prob.sum()
        fig, ax = plt.subplots(figsize=(7, 3.2))
        ax.plot(d_axis, prob, lw=1.5, label="softmax(cost)")
        ax.axvline(disp[y, x], color="tab:orange", ls="--",
                   label=f"est {disp[y, x]:.2f}")
        if gt is not None:
            ax.axvline(gt[y, x, 0], color="tab:green", ls=":",
                       label=f"gt {gt[y, x, 0]:.2f}")
        ax.set_xlabel("disparity")
        ax.set_ylabel("probability")
        ax.set_title(f"pixel (y={y}, x={x})")
        ax.legend(frameon=False, fontsize=8)
        fig.tight_layout()
        path = os.path.join(args.out_dir, f"cost_y{y}_x{x}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
