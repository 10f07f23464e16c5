import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose
from scipy.spatial.transform import Rotation

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.core.projection import pi, inv_pi
from tadataka_tpu.core.transforms import (
    motion_matrix, inv_motion_matrix, relative_transform, transform_points,
    to_homogeneous, from_homogeneous, transform_all, inv_transform_all)
from tadataka_tpu.core.warp import warp_depth, Warp2D, LocalWarp2D
from tadataka_tpu.core.triangulation import (
    calc_depth0, linear_triangulation, two_view_triangulation,
    depths_from_triangulation)
from tadataka_tpu.core.image_range import is_in_image_range
from tadataka_tpu.core.coordinates import image_coordinates
from tadataka_tpu.camera import CameraParameters, CameraModel


def random_pose(rng):
    R = Rotation.from_rotvec(rng.uniform(-1, 1, 3)).as_matrix()
    t = rng.uniform(-2, 2, 3)
    return Pose(jnp.asarray(R, dtype=jnp.float32),
                jnp.asarray(t, dtype=jnp.float32))


def test_projection_roundtrip(rng):
    P = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    P[:, 2] = rng.uniform(1, 5, 10)
    x = pi(jnp.asarray(P))
    assert_allclose(x, P[:, :2] / P[:, 2:3], rtol=1e-5)
    P_rec = inv_pi(x, jnp.asarray(P[:, 2]))
    assert_allclose(P_rec, P, rtol=1e-5)


def test_homogeneous():
    X = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    H = to_homogeneous(X)
    assert_allclose(H, [[1, 2, 1], [3, 4, 1]])
    assert_allclose(from_homogeneous(H), X)


def test_motion_matrix_inverse(rng):
    pose = random_pose(rng)
    T = pose.T
    assert_allclose(np.asarray(inv_motion_matrix(T) @ T), np.eye(4), atol=1e-5)


def test_pose_composition(rng):
    a, b = random_pose(rng), random_pose(rng)
    c = a * b
    P = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
    expected = a.apply(b.apply(jnp.asarray(P)))
    assert_allclose(c.apply(jnp.asarray(P)), expected, rtol=1e-4, atol=1e-5)


def test_pose_inv(rng):
    pose = random_pose(rng)
    P = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
    assert_allclose(pose.inv().apply(pose.apply(jnp.asarray(P))), P,
                    rtol=1e-4, atol=1e-5)


def test_pose_from_se3_matches_exp(rng):
    xi = rng.uniform(-1, 1, 6).astype(np.float32)
    from tadataka_tpu.core.se3 import exp_se3
    pose = Pose.from_se3(jnp.asarray(xi))
    assert_allclose(pose.T, exp_se3(jnp.asarray(xi)), rtol=1e-5, atol=1e-6)


def test_relative_transform(rng):
    pose_wa, pose_wb = random_pose(rng), random_pose(rng)
    T_ab = relative_transform(pose_wa.T, pose_wb.T)
    # point fixed in frame b maps to frame a consistently with world route
    p_b = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
    via_world = pose_wa.inv().apply(pose_wb.apply(p_b))
    assert_allclose(transform_points(T_ab, p_b), via_world,
                    rtol=1e-4, atol=1e-4)


def test_transform_all(rng):
    Rs = jnp.asarray(np.stack([
        Rotation.from_rotvec(rng.uniform(-1, 1, 3)).as_matrix()
        for _ in range(3)]).astype(np.float32))
    ts = jnp.asarray(rng.uniform(-1, 1, (3, 3)).astype(np.float32))
    points = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    out = transform_all(Rs, ts, points)
    assert out.shape == (3, 4, 3)
    assert_allclose(out[1, 2], Rs[1] @ points[2] + ts[1], rtol=1e-5, atol=1e-6)
    # inv(transform(p)) == p per pose
    for m in range(3):
        rec = inv_transform_all(Rs, ts, out[m])[m]
        assert_allclose(rec, points, rtol=1e-4, atol=1e-5)


def test_warp_depth_geometry(rng):
    # a point at known depth warps consistently with direct transformation
    pose10 = random_pose(rng)
    P0 = jnp.asarray(np.array([[0.5, -0.3, 2.0]], dtype=np.float32))
    x0 = pi(P0)
    x1, depth1 = warp_depth(pose10.T, x0, P0[:, 2])
    P1 = pose10.apply(P0)
    assert_allclose(x1, pi(P1), rtol=1e-4, atol=1e-5)
    assert_allclose(depth1, P1[:, 2], rtol=1e-4)


def test_calc_depth0_exact(rng):
    # reproduce the reference test geometry (src/triangulation.rs tests)
    for _ in range(5):
        pose_w0, pose_w1 = random_pose(rng), random_pose(rng)
        point = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
        p0 = pose_w0.inv().apply(point)
        p1 = pose_w1.inv().apply(point)
        if abs(float(p0[2])) < 0.3 or abs(float(p1[2])) < 0.3:
            continue
        x0, x1 = pi(p0), pi(p1)
        T10 = (pose_w1.inv() * pose_w0).T
        depth = calc_depth0(T10, x0, x1)
        assert_allclose(depth, p0[2], rtol=1e-2, atol=1e-3)


def test_linear_triangulation(rng):
    # synthetic scene: known world points observed from several poses
    points_true = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
    points_true[:, 2] += 5.0
    poses = [Pose.identity()] + [random_pose(rng) for _ in range(2)]
    # keep cameras near origin looking at +z: use small motions
    poses = [Pose(p.R * 0 + jnp.eye(3), p.t * 0.3) for p in poses]
    Rs = jnp.stack([p.R for p in poses])
    ts = jnp.stack([p.t for p in poses])
    keypoints = jnp.stack([
        pi(transform_points(motion_matrix(p.R, p.t), jnp.asarray(points_true)))
        for p in poses])
    est, depths = linear_triangulation(Rs, ts, keypoints)
    assert_allclose(est, points_true, rtol=1e-2, atol=1e-2)
    assert np.all(np.asarray(depths) > 0)


def test_two_view_triangulation(rng):
    points_true = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    points_true[:, 2] += 4.0
    pose0 = Pose.identity()
    pose1 = Pose(jnp.eye(3), jnp.array([0.5, 0.0, 0.0]))
    k0 = pi(pose0.apply(jnp.asarray(points_true)))
    k1 = pi(pose1.apply(jnp.asarray(points_true)))
    est, depths = two_view_triangulation(pose0, pose1, k0, k1)
    assert_allclose(est, points_true, rtol=1e-2, atol=1e-2)


def test_depths_from_triangulation(rng):
    point = jnp.array([0.3, -0.2, 3.0])
    pose0 = Pose.identity()
    pose1 = Pose(jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
    p0, p1 = pose0.apply(point), pose1.apply(point)
    depths = depths_from_triangulation(pose0, pose1, pi(p0), pi(p1))
    assert_allclose(depths, [p0[2], p1[2]], rtol=1e-4)


def test_is_in_image_range():
    shape = (30, 20)  # H, W
    coords = jnp.array([
        [0.0, 0.0], [19.0, 29.0], [19.01, 29.0], [-0.01, 0.0], [19.0, 29.01]])
    out = is_in_image_range(coords, shape)
    assert list(np.asarray(out)) == [True, True, False, False, False]


def test_image_coordinates():
    us = image_coordinates((2, 3))
    expected = [[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]]
    assert_allclose(us, expected)


def test_warp2d_identity():
    cam = CameraModel.create(CameraParameters.create((10.0, 10.0), (5.0, 5.0)))
    warp = LocalWarp2D(cam, cam, Pose.identity())
    us0 = jnp.array([[3.0, 4.0], [7.0, 2.0]])
    us1, d1 = warp(us0, jnp.array([2.0, 3.0]))
    assert_allclose(us1, us0, atol=1e-5)
    assert_allclose(d1, [2.0, 3.0], atol=1e-6)
