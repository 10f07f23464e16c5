"""TUM RGB-D dataset loader.

Parity surface: /root/reference/tadataka/dataset/tum_rgbd.py — freiburg1-3
intrinsics + RadTan coefficients, depth = png / (5000 * per-sequence scale),
3-way gt/rgb/depth timestamp sync.  Frames are emitted with float32 device-
ready arrays and Pose pytrees (camera->world).
"""

from pathlib import Path

import numpy as np

from tadataka_tpu.camera import CameraModel, CameraParameters, RadTan
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.base import BaseDataset
from tadataka_tpu.dataset.frame import Frame
from tadataka_tpu.dataset.tum import (
    load_image_paths, load_tum_poses, synchronize)

DEPTH_FACTOR = 5000.0

# (rgb intrinsics, rgb radtan, depth intrinsics, depth radtan, depth scale)
_FREIBURG = {
    1: dict(rgb_f=[517.3, 516.5], rgb_c=[318.6, 255.3],
            rgb_d=[0.2624, -0.9531, -0.0054, 0.0026, 1.1633],
            depth_f=[591.1, 590.1], depth_c=[331.0, 234.0],
            depth_d=[-0.0410, 0.3286, 0.0087, 0.0051, -0.5643],
            scale=1.035),
    2: dict(rgb_f=[520.9, 521.0], rgb_c=[325.1, 249.7],
            rgb_d=[0.2312, -0.7849, -0.0033, -0.0001, 0.9172],
            depth_f=[580.8, 581.8], depth_c=[308.8, 253.0],
            depth_d=[-0.2297, 1.4766, 0.0005, -0.0075, -3.4194],
            scale=1.031),
    3: dict(rgb_f=[535.4, 539.2], rgb_c=[320.1, 247.6],
            rgb_d=[0, 0, 0, 0, 0],
            depth_f=[567.6, 570.2], depth_c=[324.7, 250.1],
            depth_d=[0, 0, 0, 0, 0],
            scale=1.000),
}


def _camera_model(f, c, d):
    return CameraModel.create(CameraParameters.create(f, c), RadTan.create(d))


def get_camera_model_rgb(freiburg):
    cfg = _cfg(freiburg)
    return _camera_model(cfg["rgb_f"], cfg["rgb_c"], cfg["rgb_d"])


def get_camera_model_depth(freiburg):
    cfg = _cfg(freiburg)
    return _camera_model(cfg["depth_f"], cfg["depth_c"], cfg["depth_d"])


def _cfg(freiburg):
    try:
        return _FREIBURG[freiburg]
    except KeyError:
        raise ValueError(f"No such sequence 'freiburg{freiburg}'")


def _imread(path):
    from tadataka_tpu.dataset.image_io import imread
    return imread(path)


class TumRgbdDataset(BaseDataset):
    def __init__(self, dataset_root, which_freiburg):
        cfg = _cfg(which_freiburg)
        self.depth_factor = DEPTH_FACTOR * cfg["scale"]
        self.camera_model = get_camera_model_rgb(which_freiburg)
        self.camera_model_depth = get_camera_model_depth(which_freiburg)

        timestamps_gt, rotations, positions = load_tum_poses(
            Path(dataset_root, "groundtruth.txt"))
        timestamps_rgb, paths_rgb = load_image_paths(
            Path(dataset_root, "rgb.txt"), prefix=dataset_root)
        timestamps_depth, paths_depth = load_image_paths(
            Path(dataset_root, "depth.txt"), prefix=dataset_root)

        matches = synchronize(timestamps_gt, timestamps_rgb,
                              timestamps_ref=timestamps_depth)
        indices_gt = matches[:, 0]
        indices_rgb = matches[:, 1]
        indices_depth = matches[:, 2]

        self.length = matches.shape[0]
        self.timestamps = timestamps_gt[indices_gt]
        self.rotations = rotations[indices_gt]
        self.positions = positions[indices_gt]
        self.paths_rgb = [paths_rgb[i] for i in indices_rgb]
        self.paths_depth = [paths_depth[i] for i in indices_depth]

    def load(self, index):
        image = _imread(self.paths_rgb[index])
        depth = _imread(self.paths_depth[index]).astype(np.float32)
        depth = depth / self.depth_factor
        pose = Pose(
            np.asarray(self.rotations[index].as_matrix(), dtype=np.float32),
            np.asarray(self.positions[index], dtype=np.float32))
        return Frame(self.camera_model, pose, image, depth)
