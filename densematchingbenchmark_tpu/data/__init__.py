"""Data pipeline: IO, datasets, transforms, sampling, loading."""

from .datasets import (build_dataset, StereoDataset, SceneFlowDataset,
                       Kitti2012Dataset, Kitti2015Dataset,
                       SyntheticStereoDataset)
from .loader import DataLoader, collate
from .sampler import EpochSampler
from . import transforms, io

__all__ = ["build_dataset", "StereoDataset", "SceneFlowDataset",
           "Kitti2012Dataset", "Kitti2015Dataset", "SyntheticStereoDataset",
           "DataLoader", "collate", "EpochSampler", "transforms", "io"]
