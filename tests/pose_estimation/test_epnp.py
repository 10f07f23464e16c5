import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose
from scipy.spatial.transform import Rotation

from tadataka_tpu.pose_estimation.epnp import epnp_pose
from tadataka_tpu.pose_estimation.pnp import solve_pnp_ransac


def _project(pts, R, t):
    p = pts @ R.T + t
    return (p[:, :2] / p[:, 2:3]).astype(np.float32)


def test_epnp_exact(rng):
    pts = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    t = np.array([0.4, -0.3, 0.8], np.float32)
    kp = _project(pts, R, t)

    R_est, t_est = epnp_pose(jnp.asarray(pts), jnp.asarray(kp))
    assert_allclose(np.asarray(R_est), R, atol=2e-3)
    assert_allclose(np.asarray(t_est), t, atol=2e-3)


def test_epnp_planar_scene(rng):
    """Flat scenes break the general 4-control-point layout; the planar
    branch must win (the reference's cv2 EPnP handles these internally)."""
    xy = rng.uniform(-2, 2, (40, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((40, 1), np.float32)], axis=1)
    pts[:, 2] += 5.0 * 0  # exactly planar (z=0 plane)
    R = Rotation.from_rotvec([0.1, 0.25, -0.05]).as_matrix().astype(
        np.float32)
    t = np.array([0.2, 0.1, 6.0], np.float32)
    kp = _project(pts, R, t)

    R_est, t_est = epnp_pose(jnp.asarray(pts), jnp.asarray(kp))
    assert_allclose(np.asarray(R_est), R, atol=5e-3)
    assert_allclose(np.asarray(t_est), t, atol=5e-3)


def test_epnp_minimal_five_points(rng):
    pts = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    R = Rotation.from_rotvec([0.0, 0.15, 0.1]).as_matrix().astype(np.float32)
    t = np.array([-0.1, 0.2, 0.5], np.float32)
    kp = _project(pts, R, t)

    R_est, t_est = epnp_pose(jnp.asarray(pts), jnp.asarray(kp))
    assert_allclose(np.asarray(R_est), R, atol=5e-3)
    assert_allclose(np.asarray(t_est), t, atol=5e-3)


def test_pnp_ransac_epnp_planar_with_outliers(rng):
    """RANSAC with EPnP hypotheses on a planar scene + 25% outliers —
    the degeneracy the DLT path cannot handle."""
    xy = rng.uniform(-3, 3, (80, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((80, 1), np.float32)], axis=1)
    R = Rotation.from_rotvec([0.05, 0.2, 0.0]).as_matrix().astype(np.float32)
    t = np.array([0.1, -0.2, 7.0], np.float32)
    kp = _project(pts, R, t)
    kp[:20] += rng.uniform(0.1, 0.3, (20, 2)).astype(np.float32)

    pose, inliers = solve_pnp_ransac(
        jnp.asarray(pts), jnp.asarray(kp),
        jnp.ones(len(pts), dtype=bool), jax.random.PRNGKey(7),
        reprojection_threshold=0.01, method="epnp")
    inliers = np.asarray(inliers)
    assert inliers[20:].mean() > 0.9
    assert_allclose(np.asarray(pose.R), R, atol=5e-3)
    assert_allclose(np.asarray(pose.t), t, atol=2e-2)
