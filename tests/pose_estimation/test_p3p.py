"""P3P minimal solver: quartic roots, exact recovery, RANSAC integration."""

import numpy as np
import jax
import jax.numpy as jnp

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.pose_estimation.p3p import (
    solve_quartic, p3p_solutions, p3p_best_pose)
from tadataka_tpu.pose_estimation.pnp import solve_pnp_ransac


def test_solve_quartic_against_numpy(rng):
    for _ in range(50):
        coeffs = rng.normal(0, 2, 5)
        coeffs[0] = np.sign(coeffs[0]) * max(abs(coeffs[0]), 0.3)
        roots, valid = solve_quartic(*[jnp.asarray(c, jnp.float32)
                                       for c in coeffs])
        roots = np.asarray(roots)[np.asarray(valid)]
        np_roots = np.roots(coeffs)
        np_real = np.sort(np_roots[np.abs(np_roots.imag) < 1e-6].real)
        # every true real root is found (to f32 polish accuracy)
        for r_true in np_real:
            scale = max(1.0, abs(r_true))
            assert np.min(np.abs(roots - r_true)) < 1e-2 * scale, \
                (coeffs, roots, np_real)


def _random_pose_scene(rng, n=3):
    points = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    points[:, 2] += 4.0
    rotvec = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    t = rng.uniform(-1, 1, 3).astype(np.float32)
    pose = Pose.from_rotvec(jnp.asarray(rotvec), jnp.asarray(t))
    P_cam = np.asarray(points @ np.asarray(pose.R).T + np.asarray(pose.t))
    assert (P_cam[:, 2] > 0.1).all()
    keypoints = (P_cam[:, :2] / P_cam[:, 2:3]).astype(np.float32)
    return points, keypoints, pose


def test_p3p_recovers_exact_pose(rng):
    hits = 0
    for _ in range(20):
        points, keypoints, pose = _random_pose_scene(rng, n=3)
        Rs, ts, valid = p3p_solutions(jnp.asarray(points),
                                      jnp.asarray(keypoints))
        Rs, ts = np.asarray(Rs), np.asarray(ts)
        errs = [np.abs(R - np.asarray(pose.R)).max()
                + np.abs(t - np.asarray(pose.t)).max()
                for R, t, v in zip(Rs, ts, np.asarray(valid)) if v]
        if errs and min(errs) < 5e-3:
            hits += 1
    # the true pose must be among the candidates in (nearly) every trial
    assert hits >= 18


def test_p3p_best_pose_disambiguates(rng):
    for _ in range(10):
        points, keypoints, pose = _random_pose_scene(rng, n=4)
        R, t = p3p_best_pose(jnp.asarray(points), jnp.asarray(keypoints))
        np.testing.assert_allclose(np.asarray(R), np.asarray(pose.R),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(t), np.asarray(pose.t),
                                   atol=5e-3)


def test_ransac_p3p_with_outliers(rng):
    points, keypoints, pose = _random_pose_scene(rng, n=100)
    keypoints = keypoints.copy()
    outliers = rng.choice(100, 30, replace=False)
    keypoints[outliers] += rng.uniform(0.05, 0.3, (30, 2)).astype(np.float32)

    est, inliers = solve_pnp_ransac(
        jnp.asarray(points), jnp.asarray(keypoints),
        jnp.ones(100, bool), jax.random.PRNGKey(0),
        reprojection_threshold=1e-3, method="p3p")
    np.testing.assert_allclose(np.asarray(est.R), np.asarray(pose.R),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(pose.t),
                               atol=1e-2)
    assert int(jnp.sum(inliers)) >= 60
