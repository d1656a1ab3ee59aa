"""Flow-task training + evaluation driver.

The reference ships flow eval/vis hooks but registers zero flow models, so
there is no reference training loop to mirror; this driver gives the flow
family the same surface as the stereo `train_matcher` (reference
dmb/apis/train.py:66-181 semantics: epoch loop, per-epoch eval + vis,
checkpointing) reusing the shared TPU-native pieces: threaded loader,
jit train step (trainer/train_step.make_flow_train_step), orbax
checkpoints, tensorboard media logging.

Reference parity anchors for the eval/vis parts:
  dmb/data/datasets/evaluation/flow/eval_hooks.py (per-epoch EPE/n-px)
  dmb/visualization/flow/vis_hooks.py + save_result.py (color-wheel dumps)
"""

import os
import os.path as osp
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..data.loader import DataLoader, collate
from ..parallel import make_mesh, shard_batch, replicated
from ..trainer.state import TrainState
from ..trainer.optim import build_optimizer
from ..trainer.train_step import make_flow_train_step
from ..utils.checkpoint import CheckpointManager
from ..utils.logging import get_logger, MetricsLogger
from .models import build_flow_model
from .metrics import calc_flow_error
from .vis import flow_to_color


def make_flow_eval_step(model, sparse=False):
    """jit'd (variables, batch) -> metric dict for the best flow."""

    def step(variables, batch):
        out = model.apply(variables, batch["leftImage"],
                          batch["rightImage"], train=False)
        return calc_flow_error(out["flows"][0], batch["flow"],
                               sparse=sparse)

    return jax.jit(step)


def evaluate_flow(model, variables, dataset, sparse=False, num_shards=1,
                  shard_id=0, step=None):
    """Strided-shard eval (reference flow eval_hooks semantics); returns
    (averaged metric dict, sample count for this shard)."""
    if step is None:
        step = make_flow_eval_step(model, sparse)
    sums, count = {}, 0
    for i in range(shard_id, len(dataset), num_shards):
        batch = collate([dataset[i]])
        batch = {k: v for k, v in batch.items() if k != "original_size"}
        result = jax.device_get(step(variables, batch))
        for k, v in result.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    return {k: v / max(count, 1) for k, v in sums.items()}, count


class FlowVisHook:
    """Per-epoch color-wheel dumps of estimated vs GT flow
    (reference dmb/visualization/flow/vis_hooks.py analog)."""

    def __init__(self, model, dataset, work_dir, metrics_log=None,
                 max_samples=2):
        self.dataset = dataset
        self.work_dir = work_dir
        self.metrics_log = metrics_log
        self.max_samples = max_samples
        self._step = jax.jit(
            lambda variables, l, r: model.apply(variables, l, r,
                                                train=False))

    def __call__(self, variables, epoch):
        from imageio.v2 import imwrite
        media = {}
        for i in range(min(len(self.dataset), self.max_samples)):
            batch = collate([self.dataset[i]])
            out = jax.device_get(self._step(
                variables, batch["leftImage"], batch["rightImage"]))
            est = np.asarray(out["flows"][0][0], np.float32)
            imgs = {"flow_0": flow_to_color(est)}
            if batch.get("flow") is not None:
                gt = np.asarray(batch["flow"][0], np.float32)
                imgs["flow_gt"] = flow_to_color(np.nan_to_num(gt))
            sample_dir = osp.join(self.work_dir, "vis", f"sample_{i:03d}")
            os.makedirs(sample_dir, exist_ok=True)
            for key, img in imgs.items():
                img8 = np.clip(img, 0, 255).astype(np.uint8)
                imwrite(osp.join(sample_dir, f"{key}_{epoch}.png"), img8)
                media[f"image/vis/sample_{i:03d}/{key}"] = img8
        if self.metrics_log is not None and media:
            self.metrics_log.log_media(epoch, media)


def train_flow(cfg, work_dir, train_dataset=None, eval_dataset=None,
               vis_dataset=None, resume=False, log_interval=10,
               max_steps=None, mesh=None):
    """Train a flow model per config; returns the final TrainState."""
    logger = get_logger(work_dir)
    metrics_log = MetricsLogger(work_dir)
    data_cfg = cfg["data"]
    assert train_dataset is not None, \
        "pass a train_dataset (FlyingChairs or synthetic)"

    if mesh is None:
        mesh = make_mesh()
    n_data = mesh.shape["data"]
    global_batch = data_cfg.get("batch_size_per_device", 1) * n_data
    loader = DataLoader(train_dataset, global_batch,
                        num_shards=jax.process_count(),
                        shard_id=jax.process_index(),
                        seed=cfg.get("seed", 0))
    steps_per_epoch = loader.steps_per_epoch()

    model = build_flow_model(cfg)
    tx, schedule = build_optimizer(cfg, steps_per_epoch)
    weights = tuple(cfg["model"]["losses"]["flow_l1_loss"]["weights"])

    sample = train_dataset.__getitem__(0, rng=np.random.default_rng(0))
    h, w = sample["leftImage"].shape[:2]
    dummy = jnp.zeros((global_batch, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                           dummy, dummy, train=False)
    state = TrainState.create(variables, tx,
                              jax.random.PRNGKey(cfg.get("seed", 0) + 1))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    logger.info(f"flow model params: {n_params/1e6:.3f}M, "
                f"mesh: {dict(mesh.shape)}, global batch: {global_batch}, "
                f"steps/epoch: {steps_per_epoch}")

    ckpt = CheckpointManager(work_dir)
    start_epoch = 0
    if resume:
        restored, meta = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = (meta or {}).get("epoch", 0)
            logger.info(f"resumed from step {int(state.step)}")

    state = jax.device_put(state, replicated(mesh))
    step_fn = make_flow_train_step(model, tx, weights)
    eval_step = (make_flow_eval_step(
        model, cfg["model"].get("eval", {}).get("sparse", False))
        if eval_dataset is not None else None)
    vis_hook = (FlowVisHook(model, vis_dataset, work_dir, metrics_log)
                if vis_dataset is not None and jax.process_index() == 0
                else None)

    total_epochs = cfg.get("total_epochs", 10)
    done = False
    for epoch in range(start_epoch, total_epochs):
        t0 = time.perf_counter()
        for batch in loader.epoch(epoch):
            batch = {k: v for k, v in batch.items()
                     if k in ("leftImage", "rightImage", "flow")}
            batch = shard_batch(mesh, batch)
            t1 = time.perf_counter()
            step_num = int(state.step) + 1
            state, metrics = step_fn(state, batch)
            if step_num % log_interval == 0 or step_num == 1:
                metrics = jax.device_get(metrics)
                t2 = time.perf_counter()
                fps = global_batch / max(t2 - t1, 1e-9)
                logger.info(
                    f"epoch {epoch+1}/{total_epochs} step {step_num} "
                    f"lr {float(schedule(step_num)):.2e} "
                    f"loss {float(metrics['loss']):.4f} "
                    f"data {(t1-t0)*1e3:.0f}ms step {(t2-t1)*1e3:.0f}ms "
                    f"({fps:.1f} samples/s)")
                metrics_log.log(step_num, dict(metrics), prefix="train/")
            t0 = time.perf_counter()
            if max_steps is not None and step_num >= max_steps:
                done = True
                break

        if cfg.get("checkpoint", {}).get("interval"):
            ckpt.save(int(state.step), jax.device_get(state),
                      metadata={"epoch": epoch + 1})
        if eval_dataset is not None:
            results, n = evaluate_flow(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                eval_dataset,
                num_shards=jax.process_count(),
                shard_id=jax.process_index(), step=eval_step)
            from ..evaluation.format import combine_shard_metrics
            results, n = combine_shard_metrics(results, n)
            logger.info(f"epoch {epoch+1} flow eval ({n} samples): " +
                        ", ".join(f"{k}={v:.3f}"
                                  for k, v in sorted(results.items())))
            metrics_log.log(int(state.step), results, prefix="eval/")
        if vis_hook is not None:
            vis_hook({"params": state.params,
                      "batch_stats": state.batch_stats}, epoch + 1)
        if done:
            break
    metrics_log.close()
    return state
