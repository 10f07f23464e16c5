"""High-level BA entry points used by the feature-based VO orchestrator.

Parity surface: run_ba / try_run_ba / can_run_ba
(/root/reference/tadataka/local_ba.py:137-178 and the sparseba guard).
"""

import warnings

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.core.so3 import exp_so3, log_so3
from tadataka_tpu.ba.schur import lm_solve


def can_run_ba(n_viewpoints, n_points, n_visible,
               n_pose_params=6, n_point_params=3):
    """Gauge condition: at least as many residual rows as unknowns."""
    n_rows = 2 * n_visible
    n_cols = n_pose_params * n_viewpoints + n_point_params * n_points
    return n_rows >= n_cols


def test_unique(viewpoint_indices, point_indices):
    A = np.vstack((viewpoint_indices, point_indices))
    assert np.unique(A, axis=1).shape[1] == A.shape[1]


def run_ba(viewpoint_indices, point_indices, poses, points, keypoints_true,
           max_iter=5, relative_error_threshold=0.20):
    """Optimize a window of Pose objects + 3D points.

    Mirrors run_ba (local_ba.py:137-152): max 5 LM iterations, loose
    relative threshold — BA here is a refinement step inside the VO loop.
    """
    rotvecs = jnp.stack([log_so3(p.R) for p in poses])
    ts = jnp.stack([jnp.asarray(p.t) for p in poses])
    pose_params = jnp.concatenate([rotvecs, ts], axis=-1)

    new_params, new_points, _ = lm_solve(
        pose_params, jnp.asarray(points),
        jnp.asarray(viewpoint_indices), jnp.asarray(point_indices),
        jnp.asarray(keypoints_true),
        max_iter=max_iter,
        absolute_error_threshold=1e-9,
        relative_error_threshold=relative_error_threshold)

    new_poses = [Pose(exp_so3(new_params[j, :3]), new_params[j, 3:])
                 for j in range(len(poses))]
    return new_poses, new_points


def try_run_ba(viewpoint_indices, point_indices, poses, points,
               keypoints_true):
    """Guarded BA (local_ba.py:160-178)."""
    assert len(viewpoint_indices) == len(point_indices)
    assert len(set(int(v) for v in viewpoint_indices)) == len(poses)
    assert len(set(int(v) for v in point_indices)) == len(points)
    test_unique(viewpoint_indices, point_indices)

    if not can_run_ba(n_viewpoints=len(poses), n_points=len(points),
                      n_visible=len(keypoints_true)):
        warnings.warn("Arguments are not satisfying condition to run BA",
                      RuntimeWarning)
        return poses, points

    return run_ba(viewpoint_indices, point_indices, poses, points,
                  keypoints_true)
