"""VITAMIN-E tracking tests on the synthetic scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.synthetic import multi_plane_scene
from tadataka_tpu.vo.vitamin_e import (
    init_keypoint_frame, track_sequence, match_keypoints,
    match_multiple_keypoints, triangulate_tracks, KeypointFrame)


@pytest.fixture(scope="module")
def sequence():
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.003 * i, 0.0]),
                              jnp.array([0.15 * i, 0.01 * i, 0.0]))
             for i in range(4)]
    ds = multi_plane_scene(n_frames=4, image_shape=(120, 160),
                          focal_length=(120.0, 120.0), poses=poses)
    return [ds[i] for i in range(4)]


def test_init_keypoint_frame(sequence):
    kf = init_keypoint_frame(sequence[0].image)
    assert len(kf.ids) > 100
    assert kf.coords.shape == (len(kf.ids), 2)
    assert len(np.unique(kf.ids)) == len(kf.ids)


def test_track_sequence_persistence(sequence):
    images = [f.image for f in sequence]
    keypoints = track_sequence(images, lambda_=0.5, patch_size=24,
                               fast_threshold=0.02)
    assert len(keypoints) == 4
    # a healthy fraction of tracks survives all frames
    shared = match_multiple_keypoints(keypoints)
    assert shared.shape[0] > 50

    # tracked positions follow the ground-truth warp
    m01 = match_keypoints(keypoints[0], keypoints[1])
    from tadataka_tpu.core.warp import Warp2D
    f0, f1 = sequence[0], sequence[1]
    warp = Warp2D(f0.camera_model, f1.camera_model, f0.pose, f1.pose)
    kp0 = keypoints[0].coords[m01[:, 0]]
    d0 = np.asarray(f0.depth_map)
    depths = np.array([d0[min(int(round(p[1])), 119),
                          min(int(round(p[0])), 159)] for p in kp0])
    expected, _ = warp(jnp.asarray(kp0), jnp.asarray(depths))
    err = np.linalg.norm(np.asarray(expected) - keypoints[1].coords[m01[:, 1]],
                         axis=1)
    assert np.median(err) < 2.0


def test_triangulate_tracks(sequence):
    images = [f.image for f in sequence]
    keypoints = track_sequence(images, lambda_=0.5, patch_size=24,
                               fast_threshold=0.02)
    camera_models = [f.camera_model for f in sequence]
    poses = [f.pose.inv() for f in sequence]  # world->camera
    points, depths = triangulate_tracks(camera_models, poses, keypoints)
    points = np.asarray(points)
    depths = np.asarray(depths)
    ok = np.isfinite(points).all(axis=1) & np.all(depths > 0, axis=0)
    assert ok.mean() > 0.6
    # depths should be in the scene's range
    med = np.median(depths[0][ok])
    assert 4.0 < med < 12.0
