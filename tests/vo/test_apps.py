"""End-to-end pipeline tests: SemiDenseVO and DvoTrajectory."""

import numpy as np
import jax.numpy as jnp
import pytest

from tadataka_tpu.camera import CameraParameters
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.synthetic import multi_plane_scene
from tadataka_tpu.apps import SemiDenseVO, DvoTrajectory
from tadataka_tpu.flags import Flag
from tadataka_tpu.metrics import absolute_trajectory_error
from tadataka_tpu.vo.semi_dense import SemiDenseParams


H, W = 80, 100
FOCAL = (80.0, 80.0)


@pytest.fixture(scope="module")
def sequence():
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.002 * i, 0.0]),
                              jnp.array([0.18 * i, 0.01 * i, 0.01 * i]))
             for i in range(5)]
    ds = multi_plane_scene(n_frames=5, image_shape=(H, W),
                           focal_length=FOCAL, poses=poses)
    return [ds[i] for i in range(5)]


def test_dvo_trajectory(sequence):
    vo = DvoTrajectory(sequence[0].camera_model, weights="huber",
                       n_coarse_to_fine=4, max_iter=15)
    for frame in sequence:
        vo.estimate(frame)
    est = vo.positions()
    gt = np.stack([np.asarray(f.pose.t) for f in sequence])
    ate = float(absolute_trajectory_error(jnp.asarray(est), jnp.asarray(gt),
                                          align=False))
    extent = np.linalg.norm(gt[-1] - gt[0])
    # metric-scale DVO on exact depth: tight bound
    assert ate < 0.05 * extent, (ate, extent, est, gt)


def test_semi_dense_vo_pipeline(sequence):
    cam = CameraParameters.create(FOCAL, (W / 2, H / 2))
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    vo = SemiDenseVO(cam, params=params, default_depth=8.0,
                     default_variance=1.0, uncertainty_bias=0.01,
                     depth_range=(2.0, 50.0), n_coarse_to_fine=4,
                     history_size=4)

    # bootstrap pose for the 2nd frame from ground truth (the reference
    # uses feature matching + a hand scale; GT isolates the depth pipeline)
    def init_pose(img0, img1):
        return sequence[1].pose.inv() * sequence[0].pose
    vo.initial_pose_fn = init_pose

    states = [vo.estimate(f) for f in sequence]

    gt_depth = np.asarray(sequence[-1].depth_map)
    final = states[-1]
    flags = np.asarray(final.flag_map)
    success = flags == int(Flag.SUCCESS)
    assert success.mean() > 0.2, success.mean()
    err = np.abs(np.asarray(final.depth_map) - gt_depth)[success]
    # depth converges toward GT on successful pixels
    assert np.median(err) < 1.0, np.median(err)

    # pose tracking stays sane (direction of motion)
    t_est = np.asarray(final.pose_wc.t)
    t_gt = np.asarray(sequence[-1].pose.t)
    cos = float(t_est @ t_gt / (np.linalg.norm(t_est)
                                * np.linalg.norm(t_gt) + 1e-12))
    assert cos > 0.9, (t_est, t_gt)
