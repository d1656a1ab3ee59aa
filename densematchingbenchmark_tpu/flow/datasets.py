"""Flow datasets: FlyingChairs (JSON/YAML annotations).

Parity target: dmb/data/datasets/flow/flying_chairs/base.py:9-44 — items
with 'left_image_path'/'right_image_path' (frame t / t+1) and
'flow_map_path' relative to a data root.
"""

import json
import os.path as osp

from ..data.io import load_image
from .io import load_flo


class FlyingChairsDataset:
    name = "FlyingChairs"

    def __init__(self, ann_file, root, transform=None):
        self.root = root
        if ann_file.endswith((".yaml", ".yml")):
            import yaml
            with open(ann_file) as fp:
                self.data_list = yaml.safe_load(fp)
        else:
            with open(ann_file) as fp:
                self.data_list = json.load(fp)
        self.transform = transform

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx, rng=None):
        item = self.data_list[idx]
        sample = {
            "leftImage": load_image(osp.join(self.root,
                                             item["left_image_path"])),
            "rightImage": load_image(osp.join(self.root,
                                              item["right_image_path"])),
        }
        sample["original_size"] = sample["leftImage"].shape[:2]
        if item.get("flow_map_path"):
            sample["flow"] = load_flo(osp.join(self.root,
                                               item["flow_map_path"]))
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample
