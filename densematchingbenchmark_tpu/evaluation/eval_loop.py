"""Distributed evaluation loop.

Parity target: DistStereoEvalHook (dmb/data/datasets/evaluation/stereo/
eval_hooks.py:117-292) and tools/test.py:101-208, rebuilt TPU-native:
- metrics are computed on-device inside the jit'd eval step (no per-sample
  CPU round-trip, no pickle-file gather);
- the dataset is sharded across hosts by stride (reference eval_hooks
  line 142 semantics) and metric sums are combined at the end;
- padded GT (transforms.pad_to(pad_disp=True)) keeps shapes static.
"""

import numpy as np
import jax

from .metrics import calc_error, calc_error_with_occlusion


def make_eval_metrics_step(model, lb, ub, eval_disparity_ids=(0,),
                           eval_occlusion=False):
    """jit'd: (variables, batch) -> {disp_id: metric dict} for one batch."""

    def step(variables, batch):
        out = model.apply(variables, batch["leftImage"], batch["rightImage"],
                          train=False)
        result = {}
        for did in eval_disparity_ids:
            if did >= len(out["disps"]):
                continue
            est = out["disps"][did]
            m = calc_error(est, batch["leftDisp"], lb=lb, ub=ub)
            if eval_occlusion and "rightDisp" in batch:
                m.update(calc_error_with_occlusion(
                    est, batch["leftDisp"], batch["rightDisp"], lb, ub))
            result[did] = m
        return result

    return jax.jit(step)


def evaluate(model, variables, dataset, eval_cfg, eval_disparity_ids=(0,),
             batch_size=1, num_shards=1, shard_id=0, loader=None, step=None):
    """Run eval over (a shard of) the dataset; returns averaged metrics.

    Returns {f'disp_{id}/{metric}': float}. With num_shards > 1 the caller
    must allgather-and-average the per-shard (sums, count).

    Pass a prebuilt `step` (make_eval_metrics_step) when calling repeatedly
    (e.g. per-epoch from the trainer): a fresh jax.jit closure per call
    would recompile the eval forward every epoch (1-2 min on real TPU).
    The jit cache inside one `step` also handles heterogeneous eval shapes
    (KITTI): each distinct padded shape compiles once, then hits cache.
    """
    if step is None:
        step = make_eval_metrics_step(
            model, eval_cfg.get("lower_bound", 0),
            eval_cfg.get("upper_bound", 192), eval_disparity_ids,
            eval_cfg.get("eval_occlusion", False))

    sums, count = {}, 0
    indices = range(shard_id, len(dataset), num_shards)
    from ..data.loader import collate
    for i in indices:
        samples = [dataset[i]]
        batch = collate(samples)
        batch = {k: v for k, v in batch.items() if k != "original_size"}
        result = step(variables, batch)
        result = jax.device_get(result)
        for did, m in result.items():
            for k, v in m.items():
                key = f"disp_{did}/{k}"
                sums[key] = sums.get(key, 0.0) + float(v)
        count += 1
    return {k: v / max(count, 1) for k, v in sums.items()}, count
