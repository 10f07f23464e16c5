"""NewTsukuba stereo dataset loader.

Parity surface: /root/reference/tadataka/dataset/new_tsukuba.py — stereo
pairs with XML depth ground truth (cached to .npy on first load), camera
track in centimeters with axis flips to the camera convention, baseline 10.
"""

import os
from pathlib import Path
from xml.etree import ElementTree as ET

import numpy as np
from scipy.spatial.transform import Rotation

from tadataka_tpu.camera import CameraModel, CameraParameters
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.base import BaseDataset
from tadataka_tpu.dataset.frame import Frame


def load_depth_xml(path):
    tree = ET.parse(path)
    root = tree.getroot()
    rows_node, cols_node, _, data_node = root[0]
    height, width = int(rows_node.text), int(cols_node.text)
    text = data_node.text.replace('\n', ' ').strip()
    depth_map = np.fromstring(text, sep=' ')
    return depth_map.reshape(height, width)


def _generate_cache(src_dir, cache_dir, src_extension, loader):
    for subdir in ("left", "right"):
        os.makedirs(str(Path(cache_dir, subdir)), exist_ok=True)
        for path in sorted(Path(src_dir, subdir).glob("*" + src_extension)):
            filename = path.name.replace(src_extension, ".npy")
            np.save(str(Path(cache_dir, subdir, filename)), loader(path))


def _imread(path):
    from tadataka_tpu.dataset.image_io import imread
    return imread(path)


def align_coordinate_system(positions, euler_angles):
    """camera_track.txt uses x-right/y-up/z-backward; flip to
    x-right/y-down/z-forward (180deg around x; negate y/z rotations)."""
    R = Rotation.from_rotvec([np.pi, 0, 0]).as_matrix()
    positions = positions @ R.T
    euler_angles = euler_angles.copy()
    euler_angles[:, 1:3] = -euler_angles[:, 1:3]
    return positions, euler_angles


def load_poses(pose_path):
    poses = np.loadtxt(pose_path, delimiter=',')
    positions, euler_angles = poses[:, 0:3], poses[:, 3:6]
    positions, euler_angles = align_coordinate_system(positions, euler_angles)
    rotations = Rotation.from_euler('xyz', euler_angles, degrees=True)
    return rotations, positions


def calc_baseline_offset(rotation, baseline_length):
    return rotation.as_matrix() @ np.array([baseline_length, 0, 0])


class NewTsukubaDataset(BaseDataset):
    BASELINE = 10.0

    def __init__(self, dataset_root, condition="daylight"):
        self.camera_model = CameraModel.create(
            CameraParameters.create([615.0, 615.0], [320.0, 240.0]))

        groundtruth_dir = Path(dataset_root, "groundtruth")
        illumination_dir = Path(dataset_root, "illumination")

        self.rotations, self.positions = load_poses(
            Path(groundtruth_dir, "camera_track.txt"))

        depth_dir = Path(groundtruth_dir, "depth_maps")
        # depth ground truth is optional: public mirrors of the dataset strip
        # the large depth XMLs (the reference fixture ships without them) —
        # frames then carry depth_map=None
        self.has_depth = any(Path(depth_dir, "left").glob("*.xml")) \
            if Path(depth_dir, "left").exists() else False
        depth_cache_dir = Path(groundtruth_dir, "depth_cache")
        if self.has_depth and not depth_cache_dir.exists():
            _generate_cache(depth_dir, depth_cache_dir, ".xml", load_depth_xml)
        self.depth_L_paths = sorted(Path(depth_cache_dir, "left").glob("*.npy"))
        self.depth_R_paths = sorted(Path(depth_cache_dir, "right").glob("*.npy"))

        image_dir = Path(illumination_dir, condition)
        image_cache_dir = Path(illumination_dir, condition + "_cache")
        if not image_cache_dir.exists():
            _generate_cache(image_dir, image_cache_dir, ".png", _imread)
        self.image_L_paths = sorted(Path(image_cache_dir, "left").glob("*.npy"))
        self.image_R_paths = sorted(Path(image_cache_dir, "right").glob("*.npy"))

        n = len(self.positions)
        assert len(self.image_L_paths) == len(self.image_R_paths) == n
        if self.has_depth:
            assert len(self.depth_L_paths) == len(self.depth_R_paths) == n

    def __len__(self):
        return len(self.positions)

    def load(self, index):
        image_l = np.load(self.image_L_paths[index])[..., :3]
        image_r = np.load(self.image_R_paths[index])[..., :3]
        if self.has_depth:
            depth_l = np.load(self.depth_L_paths[index])
            depth_r = np.load(self.depth_R_paths[index])
        else:
            depth_l = depth_r = None

        rotation = self.rotations[index]
        offset = calc_baseline_offset(rotation, self.BASELINE)
        R = np.asarray(rotation.as_matrix(), dtype=np.float32)
        center = self.positions[index]
        pose_wl = Pose(R, np.asarray(center - offset / 2.0, dtype=np.float32))
        pose_wr = Pose(R, np.asarray(center + offset / 2.0, dtype=np.float32))
        return (Frame(self.camera_model, pose_wl, image_l, depth_l),
                Frame(self.camera_model, pose_wr, image_r, depth_r))
