"""Loss library: functional multi-scale stereo losses + combined evaluator."""

from .disp_losses import (smooth_l1_loss, gerf_loss, conf_nll_loss,
                          quantile_loss)
from .focal import stereo_focal_loss
from .builder import make_loss_evaluator, total_loss

__all__ = ["smooth_l1_loss", "gerf_loss", "conf_nll_loss", "quantile_loss",
           "stereo_focal_loss", "make_loss_evaluator", "total_loss"]
