"""Per-epoch training-time visualization hook.

Parity target: dmb/visualization/stereo/vis_hooks.py:62-180
(DistStereoVisHook) + tools/train.py:95-101 (the third "vis" dataset):
after each training epoch, run eval-mode inference on a small vis dataset
and dump colorized disparity / error / confidence panels to
<work_dir>/vis/<sample>/ as PNGs, and route the same images (plus
confidence histograms) to tensorboard via MetricsLogger.log_media.

TPU-native differences: one process drives the mesh so there is no
pickle-file rank gather; inference is one cached jit per vis shape.
"""

import os
import os.path as osp

import numpy as np
import jax


class VisHook:
    """Callable hook: (variables, epoch) -> None (writes PNGs + tb media).

    Args:
      model: the Flax model (eval-mode apply is jitted once).
      dataset: vis dataset (eval transform applied; small).
      work_dir: PNGs go to <work_dir>/vis/.
      metrics_log: utils.logging.MetricsLogger (or None).
      mean/std: to de-normalize leftImage for the group panel.
      max_disp: color-ramp scale.
      max_samples: cap on vis dataset samples per epoch.
    """

    def __init__(self, model, dataset, work_dir, metrics_log=None,
                 mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), max_disp=192,
                 max_samples=4):
        self.dataset = dataset
        self.work_dir = work_dir
        self.metrics_log = metrics_log
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.max_disp = max_disp
        self.max_samples = max_samples
        self._step = jax.jit(
            lambda variables, l, r: model.apply(variables, l, r,
                                                train=False))

    def __call__(self, variables, epoch):
        from ..visualization.show_result import ShowResultTool
        from ..data.loader import collate
        from imageio.v2 import imwrite

        tool = ShowResultTool(self.max_disp)
        media = {}
        for i in range(min(len(self.dataset), self.max_samples)):
            batch = collate([self.dataset[i]])
            out = self._step(variables, batch["leftImage"],
                             batch["rightImage"])
            out = jax.device_get(out)
            left = np.asarray(batch["leftImage"])[0] * self.std + self.mean
            result = {
                "disps": [np.asarray(d, np.float32) for d in out["disps"]],
                "leftImage": left,
            }
            if batch.get("leftDisp") is not None:
                result["leftDisp"] = np.asarray(batch["leftDisp"])
            if "confs" in out:
                result["confs"] = [np.asarray(c, np.float32)
                                   for c in out["confs"]]
            imgs = tool(result)

            sample_dir = osp.join(self.work_dir, "vis", f"sample_{i:03d}")
            os.makedirs(sample_dir, exist_ok=True)
            for key, img in imgs.items():
                img8 = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
                if img8.ndim == 2:
                    img8 = np.stack([img8] * 3, -1)
                imwrite(osp.join(sample_dir, f"{key}_{epoch}.png"), img8)
                if key in ("disp_0", "disp_0_err", "group", "conf_0",
                           "conf_0_hist"):
                    media[f"image/vis/sample_{i:03d}/{key}"] = img8
            for j, conf in enumerate(result.get("confs", [])):
                media[f"histogram/vis/sample_{i:03d}/conf_{j}"] = \
                    np.clip(conf, 0.0, 1.0)
        if self.metrics_log is not None and media:
            self.metrics_log.log_media(epoch, media)


def build_vis_dataset(cfg, eval_dataset=None):
    """vis dataset per config: data.vis.annfile if set; else a small slice
    of the eval dataset; else (Synthetic) a fresh tiny synthetic set."""
    from ..data import build_dataset, transforms, SyntheticStereoDataset

    data_cfg = cfg["data"]
    mean, std = data_cfg["mean"], data_cfg["std"]
    vis_cfg = data_cfg.get("vis", {})
    if vis_cfg.get("annfile"):
        return build_dataset(
            data_cfg, "vis",
            transform=transforms.make_eval_transform(
                vis_cfg.get("input_shape",
                            data_cfg["eval"]["input_shape"]), mean, std))
    if eval_dataset is not None:
        return eval_dataset
    if data_cfg.get("type") == "Synthetic":
        shape = data_cfg["train"]["input_shape"]
        return SyntheticStereoDataset(
            length=2, height=shape[0], width=shape[1],
            max_disp=min(cfg["model"]["max_disp"], 64),
            transform=transforms.make_eval_transform(shape, mean, std))
    return None
