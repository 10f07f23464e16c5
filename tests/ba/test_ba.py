"""BA tests mirroring the reference strategy (tests/test_local_ba.py):
Jacobians against finite differences, and convergence on a perturbed
synthetic scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose
from scipy.spatial.transform import Rotation

from tadataka_tpu.ba.residuals import (
    transform_project, pose_jacobian, point_jacobian, projection_residuals)
from tadataka_tpu.ba.schur import lm_solve, LocalBundleAdjustment
from tadataka_tpu.ba.api import run_ba, try_run_ba, can_run_ba
from tadataka_tpu.core.pose import Pose


def _make_scene(rng, n_viewpoints=4, n_points=50):
    points = rng.uniform(-1, 1, (n_points, 3)).astype(np.float32)
    points[:, 2] += 5.0
    rotvecs = rng.uniform(-0.1, 0.1, (n_viewpoints, 3)).astype(np.float32)
    ts = rng.uniform(-0.5, 0.5, (n_viewpoints, 3)).astype(np.float32)
    poses = np.hstack([rotvecs, ts])

    # full visibility
    vi, pi_ = np.meshgrid(np.arange(n_viewpoints), np.arange(n_points))
    viewpoint_indices = vi.T.ravel()
    point_indices = pi_.T.ravel()

    x_true = np.stack([
        np.asarray(transform_project(jnp.asarray(poses[j]),
                                     jnp.asarray(points[i])))
        for j, i in zip(viewpoint_indices, point_indices)])
    return (poses, points, viewpoint_indices, point_indices,
            x_true.astype(np.float32))


def test_transform_project():
    pose = jnp.asarray(np.hstack([
        Rotation.from_matrix(np.eye(3)).as_rotvec(), [1.0, 2.0, 3.0]
    ]).astype(np.float32))
    point = jnp.array([0.5, -0.5, 1.0])
    out = transform_project(pose, point)
    assert_allclose(out, [1.5 / 4.0, 1.5 / 4.0], rtol=1e-5)


def test_jacobians_match_finite_differences(rng):
    # reference bound: relative error < 0.1 vs finite differences
    for _ in range(5):
        pose = rng.uniform(-0.5, 0.5, 6).astype(np.float32)
        point = rng.uniform(-1, 1, 3).astype(np.float32)
        point[2] += 4.0
        A = np.asarray(pose_jacobian(jnp.asarray(pose), jnp.asarray(point)))
        B = np.asarray(point_jacobian(jnp.asarray(pose), jnp.asarray(point)))

        eps = 1e-3
        for k in range(6):
            dp = np.zeros(6, np.float32)
            dp[k] = eps
            f1 = np.asarray(transform_project(jnp.asarray(pose + dp),
                                              jnp.asarray(point)))
            f0 = np.asarray(transform_project(jnp.asarray(pose - dp),
                                              jnp.asarray(point)))
            fd = (f1 - f0) / (2 * eps)
            assert_allclose(A[:, k], fd, rtol=0.1, atol=1e-3)
        for k in range(3):
            dp = np.zeros(3, np.float32)
            dp[k] = eps
            f1 = np.asarray(transform_project(jnp.asarray(pose),
                                              jnp.asarray(point + dp)))
            f0 = np.asarray(transform_project(jnp.asarray(pose),
                                              jnp.asarray(point - dp)))
            fd = (f1 - f0) / (2 * eps)
            assert_allclose(B[:, k], fd, rtol=0.1, atol=1e-3)


def test_lm_converges_on_perturbed_scene(rng):
    poses, points, vi, pi_, x_true = _make_scene(rng)
    poses_noisy = poses + rng.normal(0, 0.01, poses.shape).astype(np.float32)
    points_noisy = points + rng.normal(0, 0.05, points.shape).astype(
        np.float32)

    def err(po, pt):
        r = projection_residuals(jnp.asarray(po), jnp.asarray(pt),
                                 jnp.asarray(vi), jnp.asarray(pi_),
                                 jnp.asarray(x_true))
        return float(jnp.mean(jnp.sum(r * r, axis=-1)))

    e_before = err(poses_noisy, points_noisy)
    new_poses, new_points, final_err = lm_solve(
        jnp.asarray(poses_noisy), jnp.asarray(points_noisy),
        jnp.asarray(vi), jnp.asarray(pi_), jnp.asarray(x_true),
        max_iter=50)
    e_after = err(np.asarray(new_poses), np.asarray(new_points))
    assert e_after < e_before
    assert e_after < 1e-6, (e_before, e_after)


def test_local_bundle_adjustment_class(rng):
    poses, points, vi, pi_, x_true = _make_scene(rng, n_viewpoints=3,
                                                 n_points=30)
    ba = LocalBundleAdjustment(vi, pi_, x_true)
    rotvecs = poses[:, :3] + rng.normal(0, 0.005, (3, 3)).astype(np.float32)
    ts = poses[:, 3:] + rng.normal(0, 0.01, (3, 3)).astype(np.float32)
    pts = points + rng.normal(0, 0.02, points.shape).astype(np.float32)
    new_r, new_t, new_p = ba.compute(rotvecs, ts, pts, max_iter=30)
    r = projection_residuals(
        jnp.asarray(np.hstack([np.asarray(new_r), np.asarray(new_t)])),
        jnp.asarray(new_p), jnp.asarray(vi), jnp.asarray(pi_),
        jnp.asarray(x_true))
    assert float(jnp.mean(jnp.sum(r * r, axis=-1))) < 1e-6


def test_run_ba_pose_objects(rng):
    poses_np, points, vi, pi_, x_true = _make_scene(rng, n_viewpoints=3,
                                                    n_points=40)
    poses = [Pose.from_rotvec(jnp.asarray(p[:3] + 0.005),
                              jnp.asarray(p[3:] + 0.01))
             for p in poses_np]
    pts_noisy = points + rng.normal(0, 0.02, points.shape).astype(np.float32)
    new_poses, new_points = run_ba(vi, pi_, poses, pts_noisy, x_true,
                                   max_iter=10)
    r = projection_residuals(
        jnp.asarray(np.hstack([np.asarray(jnp.stack(
            [p.rotvec for p in new_poses])),
            np.asarray(jnp.stack([p.t for p in new_poses]))])),
        jnp.asarray(new_points), jnp.asarray(vi), jnp.asarray(pi_),
        jnp.asarray(x_true))
    err = float(jnp.mean(jnp.sum(r * r, axis=-1)))
    assert err < 1e-4


def test_can_run_ba():
    assert can_run_ba(n_viewpoints=3, n_points=30, n_visible=90)
    assert not can_run_ba(n_viewpoints=3, n_points=30, n_visible=20)


def test_try_run_ba_warns_when_underdetermined(rng):
    poses_np, points, vi, pi_, x_true = _make_scene(rng, n_viewpoints=2,
                                                    n_points=10)
    # keep only a few observations (from both viewpoints) -> underdetermined
    keep = np.array([0, 1, 2, 3, 10, 11, 12, 13])
    vi2 = vi[keep]
    pi2 = pi_[keep]
    # reindex to keep index sets dense
    upids = np.unique(pi2)
    remap = {int(v): k for k, v in enumerate(upids)}
    pi2 = np.array([remap[int(v)] for v in pi2])
    poses = [Pose.from_rotvec(jnp.asarray(p[:3]), jnp.asarray(p[3:]))
             for p in poses_np]
    with pytest.warns(RuntimeWarning):
        out_poses, out_points = try_run_ba(vi2, pi2, poses,
                                           points[upids], x_true[keep])
    assert out_poses is poses
