"""Collaborative-style dataset: timestamp-named color/depth PNG pairs.

Parity surface: /root/reference/tadataka/dataset/collaborative.py — a flat
directory of ``<timestamp>.color.png`` / ``<timestamp>.depth.png`` pairs.
"""

import re
from pathlib import Path

import numpy as np

from tadataka_tpu.dataset.base import BaseDataset
from tadataka_tpu.dataset.frame import Frame
from tadataka_tpu.dataset.image_io import imread


def extract_timestamp(filename):
    return int(re.findall(r"\d+", filename)[0])


class CollaborativeDataset(BaseDataset):
    def __init__(self, dataset_root, camera_model=None, depth_factor=1000.0):
        self.dataset_root = Path(dataset_root)
        self.camera_model = camera_model
        self.depth_factor = depth_factor

        paths_color = sorted(self.dataset_root.glob("*.color.png"))
        paths_depth = sorted(self.dataset_root.glob("*.depth.png"))
        color = {extract_timestamp(p.name): p for p in paths_color}
        depth = {extract_timestamp(p.name): p for p in paths_depth}
        self.timestamps = sorted(set(color) & set(depth))
        self.paths = [(color[t], depth[t]) for t in self.timestamps]
        self.length = len(self.paths)

    def load(self, index):
        color_path, depth_path = self.paths[index]
        image = imread(color_path)
        depth = imread(depth_path).astype(np.float32) / self.depth_factor
        return Frame(self.camera_model, None, image, depth)
