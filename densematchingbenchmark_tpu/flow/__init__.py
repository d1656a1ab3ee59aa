"""Optical-flow task scaffolding.

Parity with the reference's flow support (SURVEY.md: dataset/transform/
eval/vis plumbing exists, zero flow models registered —
dmb/modeling/flow/models/__init__.py:2-4 has an empty registry). This
package provides the same surface: .flo IO, FlyingChairs dataset, flow
transforms, EPE/n-px metrics, color-wheel visualization, and an empty model
registry ready for flow meta-architectures.
"""

from .io import load_flo, save_flo
from .datasets import FlyingChairsDataset
from .metrics import calc_flow_error
from .vis import flow_to_color
from .models import FLOW_META_ARCHITECTURES, build_flow_model

__all__ = ["load_flo", "save_flo", "FlyingChairsDataset", "calc_flow_error",
           "flow_to_color", "FLOW_META_ARCHITECTURES", "build_flow_model"]
