"""Visualization: disparity colormaps, error maps, result saving."""

from .colormap import disp_map, disp_to_color, disp_err_to_color, group_color
from .save import SaveResultTool

__all__ = ["disp_map", "disp_to_color", "disp_err_to_color", "group_color",
           "SaveResultTool"]
