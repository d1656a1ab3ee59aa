"""Model zoo: meta-architectures, backbones, aggregators, heads."""

from .builder import build_model
from .generalized import GeneralizedStereoModel

__all__ = ["build_model", "GeneralizedStereoModel"]
