"""Config zoo: one module per (model, dataset) pair, mirroring configs/.

Each module exposes get_config(**overrides) -> nested dict. Field names
follow the reference's config files (configs/PSMNet/scene_flow.py etc.) so
users can diff them 1:1; paths/hardware fields are replaced by TPU-native
equivalents.
"""

from . import psmnet
from . import gcnet
from . import stereonet

CONFIGS = {
    "PSMNet/scene_flow": psmnet.scene_flow,
    "PSMNet/kitti_2015": psmnet.kitti_2015,
    "GCNet/scene_flow": gcnet.scene_flow,
    "GCNet/kitti_2015": gcnet.kitti_2015,
    "StereoNet/scene_flow_8x_2stage": stereonet.scene_flow_8x_2stage,
    "StereoNet/scene_flow_8x_4stage": stereonet.scene_flow_8x_4stage,
}


def get_config(name, **overrides):
    return CONFIGS[name](**overrides)
