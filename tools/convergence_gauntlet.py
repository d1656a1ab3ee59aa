#!/usr/bin/env python
"""Synthetic convergence gauntlet for the whole model zoo.

VERDICT r4 #2: datasets are not mounted in this environment, so real-data
EPE runs are blocked — the strongest obtainable accuracy evidence is that
every family's SHIPPED loss path actually converges when trained: AcfNet's
cmn+focal path, DeepPruner's quantile+PatchMatch path, AnyNet's SPN path,
GCNet/PSMNet/StereoNet's multi-scale smooth-L1, and both flow families'
sequence losses. This tool trains each family for a few hundred steps on
the deterministic textured synthetic-stereo generator with EXACT ground
truth (data/datasets.SyntheticStereoDataset, flow analog in
flow/datasets.py), at reduced resolution with the shipped config's losses/
optimizer/schedules, and asserts end-point EPE against a per-family
threshold. Loss curves + init/final EPE land in CONVERGENCE_r{N}.json and
DESIGN.md.

Training-behavior parity target:
dmb/modeling/stereo/models/general_stereo_model.py:60-78 (train returns
loss dict; those losses are what the reference's published ResultOf*.md
curves descend) — here we prove the rebuilt losses descend too.

Usage (real TPU, single client!):
  python tools/convergence_gauntlet.py [--families PSMNet ...] [--steps 300]
  python tools/convergence_gauntlet.py --cpu --steps 20   # smoke

The CPU-tiny CI variant lives in tests/test_convergence_gauntlet.py and
imports run_stereo_family / run_flow_family from here.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (family, config name, config overrides, EPE threshold after 300 steps)
# Thresholds PINNED from the first recorded v5e run (CONVERGENCE_r05.json,
# round 5): 1.5x the measured held-out final EPE, so the gate catches real
# regressions, not stochastic noise. Families without a recorded on-chip
# run yet (they did not fit the round-5 budget — see DESIGN.md §9) carry a
# provisional threshold marked `# provisional`; pin them on first run.
STEREO_FAMILIES = [
    ("PSMNet", "PSMNet/scene_flow", {}, 10.3),
    ("AcfNet-adaptive", "AcfNet/scene_flow_adaptive", {}, 28.6),
    ("AcfNet-uniform", "AcfNet/scene_flow_uniform", {}, 28.6),  # provisional
    ("GCNet", "GCNet/scene_flow", {}, 30.0),  # provisional
    ("StereoNet-2stage", "StereoNet/scene_flow_8x_2stage", {}, 2.5),
    ("StereoNet-4stage", "StereoNet/scene_flow_8x_4stage", {}, 2.5),  # provisional
    ("AnyNet", "AnyNet/scene_flow", {}, 17.8),
    ("DeepPruner-4x", "DeepPruner/scene_flow_4x", {}, 19.5),
    ("DeepPruner-8x", "DeepPruner/scene_flow_8x", {}, 19.5),  # provisional
]
FLOW_FAMILIES = [
    ("PWCFlow", "PWCFlow/flying_chairs", {}, 2.5),  # provisional
    ("RAFT", "RAFT/flying_chairs", {}, 2.0),  # provisional
]


def _stereo_data(cfg, crop_hw, gen_hw, gen_max_disp, train_len, eval_len,
                 batch, seed):
    from densematchingbenchmark_tpu.data import (SyntheticStereoDataset,
                                                 DataLoader, transforms)
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    train_ds = SyntheticStereoDataset(
        length=train_len, height=gen_hw[0], width=gen_hw[1],
        max_disp=gen_max_disp, seed=seed,
        transform=transforms.make_train_transform(crop_hw, mean, std))
    eval_ds = SyntheticStereoDataset(
        length=eval_len, height=crop_hw[0], width=crop_hw[1],
        max_disp=gen_max_disp, seed=seed + 7,
        transform=transforms.make_eval_transform(crop_hw, mean, std))
    loader = DataLoader(train_ds, batch, seed=seed)
    return loader, eval_ds


def _epe(forward_fn, variables, eval_ds, out_key="disps"):
    """Mean EPE of the best output over valid GT pixels, full eval set."""
    import numpy as np
    import jax.numpy as jnp
    errs = []
    for i in range(len(eval_ds)):
        s = eval_ds.__getitem__(i, rng=np.random.default_rng(i))
        li = jnp.asarray(s["leftImage"])[None]
        ri = jnp.asarray(s["rightImage"])[None]
        pred = np.asarray(forward_fn(variables, li, ri)).astype(np.float32)
        if out_key == "disps":
            gt = s["leftDisp"][None]
            valid = gt[..., 0] > 0
            err = np.abs(pred[..., 0] - gt[..., 0])[valid]
        else:
            gt = s["flow"][None]
            err = np.sqrt(((pred - gt) ** 2).sum(-1)).reshape(-1)
        errs.append(float(err.mean()))
    return float(np.mean(errs))


def run_stereo_family(config_name, overrides=None, steps=300, batch=3,
                      crop_hw=(128, 256), gen_hw=(192, 384),
                      gen_max_disp=48, train_len=60, eval_len=8, seed=0,
                      log_every=20, overfit=False):
    """Train one stereo family on synthetic data; returns the curve dict.

    train_len defaults to 60 (divisible by every shipped gauntlet batch:
    1, 2, 3, 4) so no epoch ends in a partial batch — a partial batch is a
    second full train-step compile (~2 min on the remote-compile path) for
    zero evidence value.

    overfit=True repeats the FIRST batch every step (the CI-tiny variant:
    single-batch overfit descent is a strong, noise-free signal that the
    loss path + optimizer train; the on-chip run uses the full stochastic
    schedule instead)."""
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.models import build_model
    from densematchingbenchmark_tpu.losses import make_loss_evaluator
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer,
                                                    make_train_step)

    cfg = (config_name if isinstance(config_name, dict)
           else get_config(config_name, **(overrides or {})))
    if isinstance(config_name, dict):
        config_name = str(cfg.get("name", "<inline-cfg>"))
    loader, eval_ds = _stereo_data(cfg, crop_hw, gen_hw, gen_max_disp,
                                   train_len, eval_len, batch, seed)
    model = build_model(cfg)
    dummy = jnp.zeros((batch,) + tuple(crop_hw) + (3,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy,
                           train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=max(
        1, loader.steps_per_epoch()))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(seed + 1))
    evaluator = make_loss_evaluator(
        cfg["model"]["losses"], sparse=False,
        cmn_losses_cfg=cfg["model"].get("cmn", {}).get("losses"))
    step = make_train_step(model, tx, evaluator, donate=False)
    fwd = jax.jit(lambda v, l, r: model.apply(
        v, l, r, train=False)["disps"][0])

    t0 = time.perf_counter()
    state, losses, fixed = _drive(
        loader, step, state, steps, log_every,
        ("leftImage", "rightImage", "leftDisp"), overfit)
    wall = time.perf_counter() - t0
    final_vars = {"params": state.params, "batch_stats": state.batch_stats}
    if overfit:
        # overfit mode scores the trained batch itself (descent signal)
        def batch_epe(v):
            import numpy as np
            pred = np.asarray(fwd(v, fixed["leftImage"],
                                  fixed["rightImage"]))
            gt = np.asarray(fixed["leftDisp"])
            valid = gt[..., 0] > 0
            return float(np.abs(pred[..., 0] - gt[..., 0])[valid].mean())
        epe0, epe1 = batch_epe(variables), batch_epe(final_vars)
    else:
        epe0 = _epe(fwd, variables, eval_ds)
        epe1 = _epe(fwd, final_vars, eval_ds)
    return dict(config=config_name, steps=steps, batch=batch,
                crop=list(crop_hw), gen_max_disp=gen_max_disp,
                epe_init=round(epe0, 3), epe_final=round(epe1, 3),
                loss_first=round(losses[0][1], 4),
                loss_last=round(losses[-1][1], 4),
                losses=[(s, round(v, 4)) for s, v in losses],
                train_s=round(wall, 1))


def _drive(loader, step, state, steps, log_every, keys, overfit):
    import jax.numpy as jnp
    losses, done = [], 0
    fixed = None
    while done < steps:
        for batch_data in loader.epoch(done // max(
                1, loader.steps_per_epoch())):
            batch_dev = {k: jnp.asarray(v) for k, v in batch_data.items()
                         if k in keys}
            if overfit:
                fixed = fixed if fixed is not None else batch_dev
                batch_dev = fixed
            state, metrics = step(state, batch_dev)
            done += 1
            if done % log_every == 0 or done in (1, steps):
                losses.append((done, float(metrics["loss"])))
            if done >= steps:
                break
    return state, losses, fixed


def run_flow_family(config_name, overrides=None, steps=300, batch=4,
                    crop_hw=(128, 256), gen_hw=(192, 384), max_flow=8,
                    train_len=60, eval_len=8, seed=0, log_every=20,
                    overfit=False):
    import jax
    import jax.numpy as jnp
    from densematchingbenchmark_tpu.configs import get_config
    from densematchingbenchmark_tpu.flow.datasets import SyntheticFlowDataset
    from densematchingbenchmark_tpu.flow.models import build_flow_model
    from densematchingbenchmark_tpu.flow import transforms as ftrans
    from densematchingbenchmark_tpu.data import DataLoader
    from densematchingbenchmark_tpu.trainer import (TrainState,
                                                    build_optimizer)
    from densematchingbenchmark_tpu.trainer.train_step import (
        make_flow_train_step)

    cfg = (config_name if isinstance(config_name, dict)
           else get_config(config_name, **(overrides or {})))
    if isinstance(config_name, dict):
        config_name = str(cfg.get("name", "<inline-cfg>"))
    mean, std = cfg["data"]["mean"], cfg["data"]["std"]
    train_ds = SyntheticFlowDataset(
        length=train_len, height=gen_hw[0], width=gen_hw[1],
        max_flow=max_flow, seed=seed,
        transform=ftrans.make_train_transform(crop_hw, mean, std))
    eval_ds = SyntheticFlowDataset(
        length=eval_len, height=crop_hw[0], width=crop_hw[1],
        max_flow=max_flow, seed=seed + 7,
        transform=ftrans.make_eval_transform(crop_hw, mean, std))
    loader = DataLoader(train_ds, batch, seed=seed)

    model = build_flow_model(cfg)
    dummy = jnp.zeros((batch,) + tuple(crop_hw) + (3,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, dummy,
                           train=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=max(
        1, loader.steps_per_epoch()))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(seed + 1))
    weights = tuple(cfg["model"]["losses"]["flow_l1_loss"]["weights"])
    step = make_flow_train_step(model, tx, weights, donate=False)
    fwd = jax.jit(lambda v, l, r: model.apply(
        v, l, r, train=False)["flows"][0])

    t0 = time.perf_counter()
    state, losses, fixed = _drive(
        loader, step, state, steps, log_every,
        ("leftImage", "rightImage", "flow"), overfit)
    wall = time.perf_counter() - t0
    final_vars = {"params": state.params, "batch_stats": state.batch_stats}
    if overfit:
        def batch_epe(v):
            import numpy as np
            pred = np.asarray(fwd(v, fixed["leftImage"],
                                  fixed["rightImage"]))
            gt = np.asarray(fixed["flow"])
            return float(np.sqrt(((pred - gt) ** 2).sum(-1)).mean())
        epe0, epe1 = batch_epe(variables), batch_epe(final_vars)
    else:
        epe0 = _epe(fwd, variables, eval_ds, out_key="flows")
        epe1 = _epe(fwd, final_vars, eval_ds, out_key="flows")
    return dict(config=config_name, steps=steps, batch=batch,
                crop=list(crop_hw), max_flow=max_flow,
                epe_init=round(epe0, 3), epe_final=round(epe1, 3),
                loss_first=round(losses[0][1], 4),
                loss_last=round(losses[-1][1], 4),
                losses=[(s, round(v, 4)) for s, v in losses],
                train_s=round(wall, 1))


def main():
    p = argparse.ArgumentParser()
    all_names = [f[0] for f in STEREO_FAMILIES + FLOW_FAMILIES]
    p.add_argument("--families", nargs="*", default=all_names)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None, help="write JSON results here")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    by_name = {f[0]: ("stereo",) + f for f in STEREO_FAMILIES}
    by_name.update({f[0]: ("flow",) + f for f in FLOW_FAMILIES})
    results = []
    for name in args.families:
        task, _, config_name, overrides, thresh = by_name[name]
        # GCNet's shipped batch is 1 (reference imgs_per_gpu=1); everything
        # else trains the gauntlet at batch 3 (stereo) / 4 (flow)
        kwargs = {"steps": args.steps}
        if name == "GCNet":
            kwargs["batch"] = 1
        try:
            if task == "stereo":
                r = run_stereo_family(config_name, overrides, **kwargs)
            else:
                r = run_flow_family(config_name, overrides, **kwargs)
            r["family"] = name
            r["threshold"] = thresh
            r["pass"] = bool(r["epe_final"] <= thresh)
        except Exception as e:
            r = dict(family=name, config=config_name,
                     error=f"{type(e).__name__}: {e}")
        results.append(r)
        print(json.dumps(r))

    if args.out:
        with open(args.out, "w") as fp:
            json.dump(results, fp, indent=1)
    ok = [r for r in results if r.get("pass")]
    print(f"\n{len(ok)}/{len(results)} families under threshold")


if __name__ == "__main__":
    main()
