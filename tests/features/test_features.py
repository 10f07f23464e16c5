import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tadataka_tpu.features import (
    detect_fast, detect_harris, extract_features, match_descriptors,
    Matcher, ransac_fundamental, ransac_affine, symmetric_transfer_filter,
    compute_image_curvature, extract_curvature_extrema, ExtremaTracker)
from tadataka_tpu.features.flow import estimate_affine_transform
from tadataka_tpu.dataset import PlaneSceneDataset


@pytest.fixture(scope="module")
def image_pair():
    ds = PlaneSceneDataset(n_frames=2, image_shape=(80, 100),
                           focal_length=(80.0, 80.0))
    return ds[0].image, ds[1].image


def _checkerboard_with_corners(h=64, w=64):
    img = np.zeros((h, w), dtype=np.float32)
    img[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 1.0
    return jnp.asarray(img)


def test_fast_detects_square_corners():
    img = _checkerboard_with_corners()
    feats = detect_fast(img, threshold=0.2, max_keypoints=32)
    kps = np.asarray(feats.keypoints)[np.asarray(feats.mask)]
    assert len(kps) >= 4
    # detected corners should cluster near the 4 square corners
    corners = np.array([[15, 15], [47, 15], [15, 47], [47, 47]], float)
    for c in corners:
        d = np.min(np.linalg.norm(kps - c, axis=1))
        assert d <= 3.0, (c, kps)


def test_harris_detects_corners():
    img = _checkerboard_with_corners()
    feats = detect_harris(img, max_keypoints=16)
    kps = np.asarray(feats.keypoints)[np.asarray(feats.mask)]
    assert len(kps) >= 4


def test_extract_and_match_self(image_pair):
    img0, _ = image_pair
    feats = extract_features(img0, max_keypoints=128, threshold=0.05, patch_size=24)
    n = int(feats.n_valid)
    assert n > 10
    matches = match_descriptors(feats.descriptors, feats.descriptors,
                                feats.mask, feats.mask, max_ratio=1.0)
    # self-match: every valid descriptor matches itself
    m = np.asarray(matches.mask)
    idx = np.asarray(matches.indices)
    self_matched = idx[m, 0] == idx[m, 1]
    assert self_matched.mean() > 0.95


def test_matcher_pipeline(image_pair):
    img0, img1 = image_pair
    f0 = extract_features(img0, max_keypoints=256, threshold=0.03, patch_size=24)
    f1 = extract_features(img1, max_keypoints=256, threshold=0.03, patch_size=24)
    matcher = Matcher()
    matches = matcher(f0, f1)
    n = int(matches.n_valid)
    assert n >= 12
    kp0 = np.asarray(f0.keypoints)[np.asarray(matches.indices)[:, 0]]
    kp1 = np.asarray(f1.keypoints)[np.asarray(matches.indices)[:, 1]]
    m = np.asarray(matches.mask)
    # matched displacement should be consistent (plane scene, smooth flow)
    disp = kp1[m] - kp0[m]
    med = np.median(disp, axis=0)
    spread = np.abs(disp - med).mean()
    assert spread < 6.0


def test_ransac_affine_rejects_outliers(rng):
    key = jax.random.PRNGKey(0)
    N = 100
    src = rng.uniform(0, 50, (N, 2)).astype(np.float32)
    M_true = np.array([[1.1, 0.05, 2.0], [-0.03, 0.95, -1.0], [0, 0, 1]],
                      dtype=np.float32)
    dst = (np.hstack([src, np.ones((N, 1))]) @ M_true.T)[:, :2]
    # corrupt 30%
    n_out = 30
    dst[:n_out] += rng.uniform(10, 30, (n_out, 2))
    mask = np.ones(N, dtype=bool)
    M_est, inliers = ransac_affine(jnp.asarray(src), jnp.asarray(dst),
                                   jnp.asarray(mask), key)
    inliers = np.asarray(inliers)
    assert inliers[n_out:].mean() > 0.9
    assert inliers[:n_out].mean() < 0.1
    np.testing.assert_allclose(np.asarray(M_est)[:2], M_true[:2],
                               rtol=0.05, atol=0.1)


def test_ransac_fundamental_epipolar_geometry(rng):
    # points on two views of a 3D scene; F must satisfy x2' F x1 = 0
    key = jax.random.PRNGKey(1)
    N = 120
    pts = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    f, c = 100.0, 50.0
    x1 = pts[:, :2] / pts[:, 2:3] * f + c
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, 0.1, 0.0], dtype=np.float32)
    p2 = pts @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:3] * f + c
    # corrupt 25%
    n_out = 30
    x2_c = x2.copy()
    x2_c[:n_out] += rng.uniform(8, 20, (n_out, 2))
    mask = np.ones(N, dtype=bool)
    F, inliers = ransac_fundamental(jnp.asarray(x1), jnp.asarray(x2_c),
                                    jnp.asarray(mask), key)
    inliers = np.asarray(inliers)
    assert inliers[n_out:].mean() > 0.85
    assert inliers[:n_out].mean() < 0.2


def test_symmetric_transfer_filter(rng):
    # inliers follow a homography; outliers don't
    N = 80
    src = rng.uniform(0, 50, (N, 2)).astype(np.float32)
    H_true = np.array([[1.05, 0.02, 1.0], [0.01, 0.98, -2.0],
                       [0.0001, 0.0, 1.0]], dtype=np.float32)
    p = np.hstack([src, np.ones((N, 1))]) @ H_true.T
    dst = p[:, :2] / p[:, 2:3]
    dst += rng.normal(0, 0.1, dst.shape)
    n_out = 10
    dst[:n_out] += rng.uniform(15, 25, (n_out, 2))
    mask = np.ones(N, dtype=bool)
    keep = np.asarray(symmetric_transfer_filter(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)))
    # chi^2 whitened gate is soft (it runs after RANSAC in the pipeline):
    # most gross outliers rejected, inliers overwhelmingly kept
    assert keep[:n_out].mean() <= 0.4
    assert keep[n_out:].mean() > 0.9


def test_curvature_extrema(image_pair):
    img0, _ = image_pair
    kps, mask = extract_curvature_extrema(img0, percentile=95.0,
                                          max_keypoints=256)
    kps = np.asarray(kps)[np.asarray(mask)]
    assert len(kps) > 50
    curv = np.asarray(compute_image_curvature(img0))
    thresh = np.percentile(curv, 95.0)
    for p in kps[:20]:
        assert curv[int(p[1]), int(p[0])] > thresh


def test_extrema_tracker_climbs_hill():
    # curvature map with a single hill at (12, 20) [x, y]
    H, W = 32, 32
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    curv = np.exp(-((xs - 12) ** 2 + (ys - 20) ** 2) / 8.0)
    tracker = ExtremaTracker(jnp.asarray(curv), lambda_=0.0)
    p0 = jnp.asarray(np.array([[10.0, 18.0], [14.0, 22.0]], np.float32))
    out = np.asarray(tracker.optimize(p0))
    np.testing.assert_allclose(out, [[12, 20], [12, 20]], atol=1e-5)


def test_extrema_tracker_regularizer_limits_drift():
    H, W = 32, 32
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    curv = np.exp(-((xs - 25) ** 2 + (ys - 25) ** 2) / 8.0)
    # strong regularizer: keypoint far from the hill should barely move
    tracker = ExtremaTracker(jnp.asarray(curv), lambda_=1e6)
    p0 = jnp.asarray(np.array([[5.0, 5.0]], np.float32))
    out = np.asarray(tracker.optimize(p0))
    assert np.linalg.norm(out - p0) < 3.0


def test_extrema_tracker_out_of_range_passthrough():
    curv = jnp.zeros((16, 16))
    tracker = ExtremaTracker(curv, lambda_=0.1)
    p0 = jnp.asarray(np.array([[-5.0, 3.0], [100.0, 3.0]], np.float32))
    out = np.asarray(tracker.optimize(p0))
    np.testing.assert_allclose(out, np.asarray(p0))


def test_affine_flow_irls(rng):
    N = 60
    src = rng.uniform(0, 40, (N, 2)).astype(np.float32)
    M = np.array([[1.02, -0.03, 3.0], [0.05, 0.97, -2.0], [0, 0, 1]],
                 np.float32)
    dst = (np.hstack([src, np.ones((N, 1))]) @ M.T)[:, :2]
    dst += rng.normal(0, 0.05, dst.shape)
    # a few gross outliers — IRLS should downweight them
    dst[:5] += 30.0
    tform = estimate_affine_transform(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(tform.matrix)[:2], M[:2],
                               rtol=0.05, atol=0.15)
    # inverse consistency
    back = tform.inverse(tform(jnp.asarray(src)))
    np.testing.assert_allclose(np.asarray(back), src, atol=0.05)
