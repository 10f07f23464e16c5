"""Synthetic textured-plane scenes with exact ground truth.

The reference ships 5-frame slices of real datasets as test fixtures
(/root/reference/tests/dataset/); this framework instead renders procedural
scenes with analytically exact depth maps and photometric consistency across
views — a stronger fixture: DVO/semi-dense/BA accuracy can be asserted
against closed-form ground truth rather than against another estimate.

Geometry: a plane (origin p0, normal n) in world coordinates, painted with a
smooth multi-frequency texture.  For a camera with pose T_wc (camera->world),
pixel ray [x, y, 1] intersects the plane at depth
s = ((p0 - o_w) . n) / (d_w . n), which *is* the pinhole depth since the ray
z-component is 1.  Rendering is one vmapped expression over the pixel grid —
no rasterizer, runs on device.
"""

import math
from typing import Callable, NamedTuple

import numpy as np

import jax.numpy as jnp

from tadataka_tpu.core.coordinates import image_coordinates
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.base import BaseDataset
from tadataka_tpu.dataset.frame import Frame
from tadataka_tpu.camera import CameraModel, CameraParameters


def default_texture(X, Y):
    """Smooth, gradient-rich texture on the plane's (X, Y) coordinates."""
    v = (jnp.sin(1.3 * X) * jnp.cos(1.7 * Y)
         + 0.5 * jnp.sin(3.1 * X + 0.7) * jnp.sin(2.3 * Y + 1.1)
         + 0.25 * jnp.cos(7.3 * X - 1.9) * jnp.cos(5.9 * Y + 0.3)
         + 0.125 * jnp.sin(13.7 * X + 2.7) * jnp.cos(11.1 * Y - 0.8))
    return 0.5 + 0.25 * v  # roughly [0, 1]


class PlaneScene(NamedTuple):
    plane_origin: jnp.ndarray  # (3,)
    plane_normal: jnp.ndarray  # (3,), unit


def render_plane_scene(camera_model, pose_wc, image_shape,
                       plane_origin=(0.0, 0.0, 10.0),
                       plane_normal=(0.0, 0.0, -1.0),
                       texture: Callable = default_texture,
                       planes=None):
    """Render (image, depth_map) for a camera at pose_wc (camera->world).

    ``planes``: optional list of (origin, normal) pairs; each pixel takes
    the nearest positive-depth intersection (a piecewise-planar scene —
    non-coplanar structure keeps downstream PnP/BA well-posed).  Without
    it, the single (plane_origin, plane_normal) plane is used.
    """
    if planes is None:
        planes = [(plane_origin, plane_normal)]

    H, W = image_shape
    us = image_coordinates(image_shape)
    xs = camera_model.normalize(us)              # (H*W, 2)
    dirs_c = jnp.concatenate(
        [xs, jnp.ones((xs.shape[0], 1), dtype=xs.dtype)], axis=-1)

    R_wc, t_wc = pose_wc.R, pose_wc.t            # camera -> world
    o_w = t_wc                                   # camera center in world
    d_w = dirs_c @ R_wc.T                        # ray directions in world

    best_s = jnp.full((us.shape[0],), jnp.inf, dtype=jnp.float32)
    best_xy = jnp.zeros((us.shape[0], 2), dtype=jnp.float32)
    for k, (origin, normal) in enumerate(planes):
        p0 = jnp.asarray(origin, dtype=jnp.float32)
        n = jnp.asarray(normal, dtype=jnp.float32)
        n = n / jnp.linalg.norm(n)
        denom = d_w @ n
        s = ((p0 - o_w) @ n) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        s = jnp.where(s > 0, s, jnp.inf)
        X_w = o_w + s[:, None] * d_w
        closer = s < best_s
        best_s = jnp.where(closer, s, best_s)
        # offset texture coordinates per plane so surfaces look distinct
        best_xy = jnp.where(closer[:, None],
                            X_w[:, :2] + 3.1 * k, best_xy)

    # rays missing every plane get a far constant
    best_s = jnp.where(jnp.isinf(best_s), 100.0, best_s)
    image = texture(best_xy[:, 0], best_xy[:, 1]).reshape(H, W)
    depth = best_s.reshape(H, W)
    return image, depth


def orbit_poses(n_frames, radius=0.4, z_step=0.05, yaw_step=0.01):
    """A gentle sideways+forward trajectory looking roughly at +z."""
    poses = []
    for i in range(n_frames):
        angle = yaw_step * i
        rotvec = jnp.array([0.0, angle, 0.0], dtype=jnp.float32)
        t = jnp.array([radius * math.sin(0.3 * i),
                       0.02 * i,
                       z_step * i], dtype=jnp.float32)
        poses.append(Pose.from_rotvec(rotvec, t))
    return poses


class PlaneSceneDataset(BaseDataset):
    """n-frame synthetic sequence over the textured plane.

    Frames carry exact poses (camera->world) and exact depth maps; drop-in
    wherever TUM/NewTsukuba frames are used.
    """

    def __init__(self, n_frames=6, image_shape=(120, 160),
                 focal_length=(120.0, 120.0),
                 plane_origin=(0.0, 0.0, 10.0),
                 plane_normal=(0.1, -0.05, -1.0),
                 texture: Callable = default_texture,
                 poses=None, planes=None):
        H, W = image_shape
        self.length = n_frames
        self.image_shape = image_shape
        self.camera_model = CameraModel.create(
            CameraParameters.create(focal_length, (W / 2.0, H / 2.0)))
        self.planes = (planes if planes is not None
                       else [(plane_origin, plane_normal)])
        self.texture = texture
        self.poses = poses if poses is not None else orbit_poses(n_frames)
        assert len(self.poses) >= n_frames

    def load(self, index):
        pose = self.poses[index]
        image, depth = render_plane_scene(
            self.camera_model, pose, self.image_shape,
            texture=self.texture, planes=self.planes)
        return Frame(self.camera_model, pose, image, depth)


def multi_plane_scene(n_frames=6, image_shape=(120, 160),
                      focal_length=(120.0, 120.0), poses=None):
    """A non-coplanar fixture: three tilted planes at different depths —
    keeps PnP/BA well-posed (a single plane is a DLT-PnP degeneracy)."""
    planes = [
        ((0.0, 0.0, 10.0), (0.05, -0.02, -1.0)),
        ((-1.5, 0.0, 7.0), (0.6, 0.0, -1.0)),
        ((1.5, 1.0, 8.0), (-0.5, -0.3, -1.0)),
    ]
    return PlaneSceneDataset(n_frames=n_frames, image_shape=image_shape,
                             focal_length=focal_length, poses=poses,
                             planes=planes)


def export_tum_scene(root, n_frames=4, which_freiburg=1,
                     image_shape=(480, 640), seed=0):
    """Render a textured plane scene THROUGH the freiburg RadTan camera
    and write it to ``root`` in real TUM RGB-D format (rgb/depth/
    groundtruth txt indices, uint8 color PNGs, uint16 depth PNGs at the
    5000 * per-sequence scale).

    The reference's committed tum_rgbd test fixture contains all-zero
    30x40 placeholder images (loader-test only), so pipeline-level TUM
    evaluation uses this renderer instead: the images carry the true
    RadTan distortion of the freiburg intrinsics
    (/root/reference/tadataka/dataset/tum_rgbd.py:16) and the depth PNGs
    go through the exact uint16/depth-factor quantization the loader
    reverses — the full ingestion path is exercised in anger.

    Returns the list of ground-truth camera->world Poses.
    """
    from pathlib import Path
    from scipy.spatial.transform import Rotation

    from tadataka_tpu.dataset.image_io import imsave
    from tadataka_tpu.dataset.tum_rgbd import (
        DEPTH_FACTOR, _cfg, get_camera_model_rgb)

    root = Path(root)
    (root / "rgb").mkdir(parents=True, exist_ok=True)
    (root / "depth").mkdir(exist_ok=True)
    cfg = _cfg(which_freiburg)
    depth_factor = DEPTH_FACTOR * cfg["scale"]
    camera_model = get_camera_model_rgb(which_freiburg)

    poses = [Pose.from_rotvec(
        jnp.asarray([0.0, 0.004 * i, 0.001 * i], jnp.float32),
        jnp.asarray([0.03 * i, 0.01 * i, 0.02 * i], jnp.float32))
        for i in range(n_frames)]

    lines_rgb = ["# color images"]
    lines_depth = ["# depth images"]
    lines_gt = ["# ground truth"]
    for i, pose in enumerate(poses):
        image, depth = render_plane_scene(
            camera_model, pose, image_shape,
            plane_origin=(0.0, 0.0, 2.5),
            plane_normal=(0.06, -0.04, -1.0))
        rgb8 = np.clip(np.asarray(image) * 255.0, 0, 255).astype(np.uint8)
        rgb8 = np.repeat(rgb8[:, :, None], 3, axis=2)
        dep16 = np.clip(np.asarray(depth) * depth_factor,
                        0, 65535).astype(np.uint16)
        t = 100.0 + 0.1 * i
        imsave(root / "rgb" / f"{t:.4f}.png", rgb8)
        imsave(root / "depth" / f"{t + 0.01:.4f}.png", dep16)
        lines_rgb.append(f"{t:.4f} rgb/{t:.4f}.png")
        lines_depth.append(f"{t + 0.01:.4f} depth/{t + 0.01:.4f}.png")
        q = Rotation.from_matrix(np.asarray(pose.R)).as_quat()
        p = np.asarray(pose.t)
        lines_gt.append(f"{t + 0.005:.4f} {p[0]} {p[1]} {p[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}")
    (root / "rgb.txt").write_text("\n".join(lines_rgb) + "\n")
    (root / "depth.txt").write_text("\n".join(lines_depth) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(lines_gt) + "\n")
    return poses


def export_euroc_scene(root, n_frames=5, image_shape=(240, 320),
                       baseline=0.11):
    """Render a textured stereo sequence and write it to ``root`` in real
    EuRoC MAV format: cam0/cam1 sensor.yaml (intrinsics + RadTan
    distortion + T_BS body-frame extrinsics), timestamped data.csv image
    listings, and a state_groundtruth_estimate0 body-pose csv — the full
    ingestion surface of dataset/euroc.py
    (/root/reference/tadataka/dataset/euroc.py:28-112).

    The reference's committed euroc fixture holds all-zero 30x40
    placeholder images (loader-test only, like the TUM one), so
    pipeline-level EuRoC evaluation renders through this exporter: the
    yaml intrinsics, the 4-coefficient RadTan distortion, and the
    ``T_wc = T_wb @ T_BS`` body-frame composition are all exercised in
    anger.  Both cameras share one (non-trivial) body-frame rotation so
    the pair stays a laterally-rectified stereo rig with the given
    ``baseline`` along the camera x axis.

    Ground-truth (image, depth) pairs for every cam0 frame are saved
    under ``root/debug_gt/`` (NOT part of the EuRoC format; for tests).
    Returns the list of body->world Poses.
    """
    from pathlib import Path
    from scipy.spatial.transform import Rotation

    from tadataka_tpu.dataset.image_io import imsave
    from tadataka_tpu.camera import RadTan

    H, W = image_shape
    root = Path(root)
    focal = (0.7 * W, 0.7 * W)
    offset = (W / 2.0 + 3.0, H / 2.0 - 2.0)
    dist = [-0.08, 0.01, 5e-5, 1e-5]       # EuRoC-like RadTan (k1 k2 p1 p2)

    # one shared body->camera rotation (small tilt: exercises the T_BS
    # composition without breaking lateral-stereo rectification)
    R_bc = Rotation.from_rotvec([0.02, -0.03, 0.01]).as_matrix()
    T_bc0 = np.eye(4)
    T_bc0[:3, :3] = R_bc
    T_bc0[:3, 3] = [0.015, -0.01, 0.005]
    T_bc1 = T_bc0.copy()
    # baseline along the CAMERA x axis, expressed in the body frame
    T_bc1[:3, 3] = T_bc0[:3, 3] + R_bc @ np.array([baseline, 0.0, 0.0])

    cam_model = CameraModel.create(
        CameraParameters.create(focal, offset), RadTan.create(dist))

    def write_cam(idx, T_bc):
        d = root / f"cam{idx}"
        (d / "data").mkdir(parents=True, exist_ok=True)
        yaml_text = (
            "sensor_type: camera\n"
            f"intrinsics: [{focal[0]}, {focal[1]}, "
            f"{offset[0]}, {offset[1]}]\n"
            "distortion_model: radial-tangential\n"
            f"distortion_coefficients: [{dist[0]}, {dist[1]}, "
            f"{dist[2]}, {dist[3]}]\n"
            "T_BS:\n"
            "  rows: 4\n  cols: 4\n"
            "  data: [" + ", ".join(
                f"{v:.9f}" for v in T_bc.ravel()) + "]\n")
        (d / "sensor.yaml").write_text(yaml_text)
        return d

    d0 = write_cam(0, T_bc0)
    d1 = write_cam(1, T_bc1)
    gt_dir = root / "debug_gt"
    gt_dir.mkdir(exist_ok=True)
    (root / "state_groundtruth_estimate0").mkdir(exist_ok=True)

    body_poses = [Pose.from_rotvec(
        jnp.asarray([0.004 * i, 0.006 * i, 0.002 * i], jnp.float32),
        jnp.asarray([0.04 * i, 0.015 * i, 0.01 * i], jnp.float32))
        for i in range(n_frames)]

    rows0, rows1, rows_gt = [], [], []
    for i, pose_wb in enumerate(body_poses):
        ts = 1403636579763555584 + i * 50000000      # EuRoC-style ns
        T_wb = np.eye(4)
        T_wb[:3, :3] = np.asarray(pose_wb.R)
        T_wb[:3, 3] = np.asarray(pose_wb.t)
        for cam_i, (d, T_bc, rows) in enumerate(
                [(d0, T_bc0, rows0), (d1, T_bc1, rows1)]):
            T_wc = T_wb @ T_bc
            pose_wc = Pose(jnp.asarray(T_wc[:3, :3], jnp.float32),
                           jnp.asarray(T_wc[:3, 3], jnp.float32))
            # non-coplanar structure (plane boundaries make FAST corners
            # and keep PnP well-posed) + a high-frequency texture: this
            # rig's FOV is narrow, so the default texture is too smooth
            # at the pixel scale for corner detection
            def sharp(X, Y):
                v = (jnp.sin(9.0 * X) * jnp.cos(11.0 * Y)
                     + 0.6 * jnp.sin(23.0 * X + 0.7)
                     * jnp.sin(19.0 * Y + 1.1)
                     + 0.4 * jnp.cos(41.0 * X - 1.9)
                     * jnp.cos(37.0 * Y + 0.3)
                     + 0.3 * jnp.sin(83.0 * X + 2.7)
                     * jnp.cos(71.0 * Y - 0.8))
                return 0.5 + 0.2 * v

            image, depth = render_plane_scene(
                cam_model, pose_wc, image_shape, texture=sharp,
                planes=[((0.0, 0.0, 2.5), (0.06, -0.04, -1.0)),
                        ((-0.5, 0.0, 1.9), (0.5, 0.0, -1.0)),
                        ((0.5, 0.3, 2.1), (-0.45, -0.25, -1.0))])
            u8 = np.clip(np.asarray(image) * 255.0, 0, 255).astype(np.uint8)
            imsave(d / "data" / f"{ts}.png", u8)
            rows.append(f"{ts},{ts}.png")
            if cam_i == 0:
                np.savez(gt_dir / f"{i}.npz", image=np.asarray(image),
                         depth=np.asarray(depth))
        q = Rotation.from_matrix(T_wb[:3, :3]).as_quat()  # xyzw
        p = T_wb[:3, 3]
        rows_gt.append(
            f"{ts},{p[0]},{p[1]},{p[2]},{q[3]},{q[0]},{q[1]},{q[2]}"
            ",0,0,0,0,0,0,0,0,0")
    (d0 / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(rows0) + "\n")
    (d1 / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(rows1) + "\n")
    (root / "state_groundtruth_estimate0" / "data.csv").write_text(
        "#timestamp,px,py,pz,qw,qx,qy,qz,...\n" + "\n".join(rows_gt) + "\n")
    return body_poses
