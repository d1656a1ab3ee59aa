"""Evaluation: on-device error metrics and evaluation loops."""

from .metrics import (calc_error, calc_error_with_occlusion, occlusion_mask,
                      remove_padding)

__all__ = ["calc_error", "calc_error_with_occlusion", "occlusion_mask",
           "remove_padding"]
