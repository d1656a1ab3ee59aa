"""Logging: rank-0 text logger, JSON metrics log, tensorboard scalars+media.

Parity targets:
  dmb/utils/env.py:63-81 (rank-0-only root logger)
  dmb/utils/text_logger.py:16-136 (epoch/iter/lr/time/loss lines + .log.json)
  dmb/utils/tensorboard_logger.py:7-98 (scalar + image/figure/histogram
  tag-prefix routing — see MetricsLogger.log_media)
"""

import json
import logging
import os
import sys
import time

import numpy as np


def get_logger(work_dir=None, name="dmb_tpu", rank=0):
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO if rank == 0 else logging.ERROR)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if work_dir and rank == 0:
        os.makedirs(work_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(os.path.join(work_dir, f"{stamp}_log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricsLogger:
    """JSON-lines metrics log + optional tensorboard scalars."""

    def __init__(self, work_dir, rank=0, tensorboard=True):
        self.rank = rank
        self.json_path = None
        self.tb = None
        if rank != 0:
            return
        os.makedirs(work_dir, exist_ok=True)
        self.json_path = os.path.join(work_dir, "metrics.log.json")
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step, metrics, prefix=""):
        if self.rank != 0:
            return
        record = {"step": int(step),
                  **{prefix + k: float(v) for k, v in metrics.items()}}
        with open(self.json_path, "a") as fp:
            fp.write(json.dumps(record) + "\n")
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(prefix + k, float(v), int(step))

    def log_media(self, step, media, *, value_range=None):
        """Tag-prefix media routing (tensorboard_logger.py:45-69 parity):
        'image/<tag>'     -> add_image   (HWC float 0-255 / 0-1 or uint8)
        'histogram/<tag>' -> add_histogram (raw values)
        'figure/<tag>'    -> add_figure (matplotlib figure)
        anything else     -> add_scalar.

        value_range: optional dict tag -> 'unit' | '255' overriding the
        peak<=1 heuristic for float images (a legitimately near-black
        0-255-range image would otherwise be rescaled x255). Callers that
        pass uint8 (e.g. VisHook) are unaffected.
        """
        if self.rank != 0 or self.tb is None:
            return
        for tag, rec in media.items():
            prefix, _, suffix = tag.partition("/")
            if prefix == "image":
                img = np.asarray(rec)
                if img.ndim == 2:
                    img = img[..., None].repeat(3, -1)
                if img.dtype != np.uint8:
                    rng = (value_range or {}).get(tag)
                    if rng is None:
                        rng = "unit" if img.max() <= 1.0 + 1e-6 else "255"
                    img = np.clip(img * (255.0 if rng == "unit" else 1.0),
                                  0, 255).astype(np.uint8)
                self.tb.add_image(suffix, img, int(step), dataformats="HWC")
            elif prefix == "histogram":
                self.tb.add_histogram(suffix, np.asarray(rec).ravel(),
                                      int(step))
            elif prefix == "figure":
                self.tb.add_figure(suffix, rec, int(step))
            else:
                self.tb.add_scalar(tag, float(rec), int(step))

    def close(self):
        if self.tb is not None:
            self.tb.close()
