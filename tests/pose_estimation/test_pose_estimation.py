import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose
from scipy.spatial.transform import Rotation

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.core.projection import pi
from tadataka_tpu.pose_estimation import (
    estimate_fundamental, decompose_essential, estimate_pose_change,
    solve_pnp)
from tadataka_tpu.pose_estimation.pnp import solve_pnp_ransac


def _scene(rng, n=100):
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    return pts


def test_estimate_fundamental_epipolar_constraint(rng):
    pts = _scene(rng)
    R = Rotation.from_rotvec([0.05, -0.1, 0.02]).as_matrix().astype(np.float32)
    t = np.array([0.4, 0.1, 0.05], np.float32)
    x0 = pts[:, :2] / pts[:, 2:3]
    p1 = pts @ R.T + t
    x1 = p1[:, :2] / p1[:, 2:3]
    E = np.asarray(estimate_fundamental(jnp.asarray(x0), jnp.asarray(x1)))
    h0 = np.hstack([x0, np.ones((len(x0), 1))])
    h1 = np.hstack([x1, np.ones((len(x1), 1))])
    residuals = np.abs(np.sum(h1 * (h0 @ E.T), axis=1))
    assert residuals.mean() < 1e-4


def test_estimate_pose_change_recovers_direction(rng):
    pts = _scene(rng)
    R_true = Rotation.from_rotvec([0.03, -0.08, 0.01]).as_matrix().astype(
        np.float32)
    t_true = np.array([0.5, 0.2, -0.1], np.float32)
    x0 = pts[:, :2] / pts[:, 2:3]
    p1 = pts @ R_true.T + t_true
    x1 = p1[:, :2] / p1[:, 2:3]

    pose = estimate_pose_change(jnp.asarray(x0), jnp.asarray(x1))
    # rotation recovered
    assert_allclose(np.asarray(pose.R), R_true, atol=5e-3)
    # translation recovered up to scale
    t_est = np.asarray(pose.t)
    t_dir = t_true / np.linalg.norm(t_true)
    t_est_dir = t_est / np.linalg.norm(t_est)
    assert_allclose(t_est_dir, t_dir, atol=5e-3)


def test_decompose_essential_contains_truth(rng):
    R_true = Rotation.from_rotvec([0.1, 0.2, -0.05]).as_matrix()
    t_true = np.array([0.3, -0.5, 0.2])
    t_hat = np.array([[0, -t_true[2], t_true[1]],
                      [t_true[2], 0, -t_true[0]],
                      [-t_true[1], t_true[0], 0]])
    E = t_hat @ R_true
    R1, R2, t1, t2 = (np.asarray(v) for v in decompose_essential(
        jnp.asarray(E, dtype=jnp.float32)))
    # one of the rotation candidates matches the truth
    err = min(np.abs(R1 - R_true).max(), np.abs(R2 - R_true).max())
    assert err < 1e-3
    # translation up to scale and sign
    t_norm = t_true / np.linalg.norm(t_true)
    errt = min(np.abs(t1 / np.linalg.norm(t1) - t_norm).max(),
               np.abs(t2 / np.linalg.norm(t2) - t_norm).max())
    assert errt < 1e-3


def test_solve_pnp_exact(rng):
    pts = _scene(rng, n=60)
    R_true = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_matrix().astype(
        np.float32)
    t_true = np.array([0.3, -0.1, 0.5], np.float32)
    p_cam = pts @ R_true.T + t_true
    keypoints = p_cam[:, :2] / p_cam[:, 2:3]

    pose = solve_pnp(jnp.asarray(pts), jnp.asarray(keypoints))
    assert_allclose(np.asarray(pose.R), R_true, atol=1e-3)
    assert_allclose(np.asarray(pose.t), t_true, atol=1e-3)


def test_solve_pnp_with_outliers(rng):
    pts = _scene(rng, n=80)
    R_true = Rotation.from_rotvec([0.05, 0.1, -0.02]).as_matrix().astype(
        np.float32)
    t_true = np.array([-0.2, 0.3, 0.4], np.float32)
    p_cam = pts @ R_true.T + t_true
    keypoints = (p_cam[:, :2] / p_cam[:, 2:3]).astype(np.float32)
    n_out = 20
    keypoints[:n_out] += rng.uniform(0.2, 0.5, (n_out, 2)).astype(np.float32)

    key = jax.random.PRNGKey(5)
    pose, inliers = solve_pnp_ransac(
        jnp.asarray(pts), jnp.asarray(keypoints),
        jnp.ones(len(pts), dtype=bool), key,
        reprojection_threshold=0.01)
    inliers = np.asarray(inliers)
    assert inliers[n_out:].mean() > 0.9
    assert inliers[:n_out].mean() < 0.2
    assert_allclose(np.asarray(pose.R), R_true, atol=5e-3)
    assert_allclose(np.asarray(pose.t), t_true, atol=5e-3)


def test_solve_pnp_not_enough_points(rng):
    from tadataka_tpu.utils.exceptions import NotEnoughInliersException
    import pytest
    pts = _scene(rng, n=4)
    keypoints = pts[:, :2] / pts[:, 2:3]
    with pytest.raises(NotEnoughInliersException):
        solve_pnp(jnp.asarray(pts), jnp.asarray(keypoints))
