"""Visualization: disparity colormaps, error maps, result saving."""

from .colormap import disp_map, disp_to_color, disp_err_to_color, group_color
from .save import SaveResultTool
from .show_result import ShowResultTool, conf_to_hist, hist_to_vis

__all__ = ["disp_map", "disp_to_color", "disp_err_to_color", "group_color",
           "SaveResultTool", "ShowResultTool", "conf_to_hist",
           "hist_to_vis"]
