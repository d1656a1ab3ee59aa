"""Disparity predictor configs (parameter-free).

The reference's SoftArgmin / FasterSoftArgmin / LocalSoftArgmin
(disp_predictors/) hold no trainable parameters, so here a predictor is a
small frozen config object dispatching to the functional ops — no Flax
module needed. 'FASTER' and 'DEFAULT' share one implementation (see
ops/soft_argmin.py docstring).
"""

import dataclasses
from typing import Optional

from ..ops.soft_argmin import soft_argmin, local_soft_argmin


@dataclasses.dataclass(frozen=True)
class DispPredictor:
    type: str = "FASTER"          # DEFAULT | FASTER | LOCAL
    max_disp: int = 192
    start_disp: int = 0
    dilation: int = 1
    alpha: float = 1.0
    normalize: bool = True
    radius: int = 2               # LOCAL only
    radius_dilation: int = 1      # LOCAL only

    def __call__(self, cost_volume, disp_sample=None):
        if self.type in ("DEFAULT", "FASTER"):
            if disp_sample is not None:
                return soft_argmin(cost_volume, disp_sample=disp_sample,
                                   alpha=self.alpha, normalize=self.normalize)
            return soft_argmin(cost_volume, max_disp=self.max_disp,
                               start_disp=self.start_disp,
                               dilation=self.dilation, alpha=self.alpha,
                               normalize=self.normalize)
        if self.type == "LOCAL":
            return local_soft_argmin(
                cost_volume, max_disp=self.max_disp, radius=self.radius,
                start_disp=self.start_disp, dilation=self.dilation,
                radius_dilation=self.radius_dilation, alpha=self.alpha)
        raise ValueError(f"unknown predictor type {self.type}")


def build_disp_predictor(cfg: dict) -> DispPredictor:
    known = {f.name for f in dataclasses.fields(DispPredictor)}
    return DispPredictor(**{k: v for k, v in cfg.items() if k in known})
