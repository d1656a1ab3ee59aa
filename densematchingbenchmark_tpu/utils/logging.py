"""Logging: rank-0 text logger, JSON metrics log, tensorboard scalars.

Parity targets:
  dmb/utils/env.py:63-81 (rank-0-only root logger)
  dmb/utils/text_logger.py:16-136 (epoch/iter/lr/time/loss lines + .log.json)
  dmb/utils/tensorboard_logger.py:7-98 (scalar routing)
"""

import json
import logging
import os
import sys
import time


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

    def close(self):
        if self.tb is not None:
            self.tb.close()
