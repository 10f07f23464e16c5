"""Dense two-view triangulation three ways — sparse features, dense
curvature-extrema matching, and dense affine-flow tracking.

Counterpart of /root/reference/examples/dense_triangulation.py
(sparse_triangulation / dense_match_triangulation /
dense_track_triangulation) on the real NewTsukuba fixture frames, using
ground-truth poses like the reference.
"""

import argparse
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.core.image_range import is_in_image_range
from tadataka_tpu.core.triangulation import (
    two_view_triangulation, compute_depth_mask)
from tadataka_tpu.dataset.image_io import rgb2gray
from tadataka_tpu.dataset.new_tsukuba import NewTsukubaDataset
from tadataka_tpu.features import Matcher
from tadataka_tpu.features.brief import brief_descriptors, extract_features
from tadataka_tpu.features.curvature import (
    compute_image_curvature, extract_curvature_extrema)
from tadataka_tpu.features.detector import Features
from tadataka_tpu.features.extrema_tracker import ExtremaTracker
from tadataka_tpu.features.flow import estimate_affine_transform

FIXTURE = Path("/root/reference/tests/dataset/new_tsukuba")
FAST_THRESHOLD = 20.0 / 255.0


def extract_dense_features(image):
    """BRIEF descriptors at curvature extrema (extract_dense_features,
    reference example:38-46)."""
    kps, mask = extract_curvature_extrema(jnp.asarray(image),
                                          percentile=95.0,
                                          max_keypoints=2048)
    desc, dmask = brief_descriptors(jnp.asarray(image), kps, mask)
    return Features(kps, desc, mask & dmask)


def matched_normalized(camera_model, feats0, feats1, matcher):
    m = matcher(feats0, feats1)
    idx = np.asarray(m.indices)[np.asarray(m.mask)]
    kp0 = np.asarray(feats0.keypoints)[idx[:, 0]]
    kp1 = np.asarray(feats1.keypoints)[idx[:, 1]]
    return (camera_model.normalize(jnp.asarray(kp0)),
            camera_model.normalize(jnp.asarray(kp1)), kp0, kp1)


def triangulate(pose0, pose1, n0, n1):
    points, depths = two_view_triangulation(pose0.inv(), pose1.inv(), n0, n1)
    ok = np.asarray(compute_depth_mask(depths))
    return np.asarray(points)[ok], ok


def report(name, points):
    z = points[:, 2] if len(points) else np.zeros(1)
    print(f"{name}: {len(points)} points, "
          f"median depth {np.median(np.linalg.norm(points, axis=1)):.1f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    ds = NewTsukubaDataset(FIXTURE)
    frame0, _ = ds[0]
    frame1, _ = ds[4]
    image0 = rgb2gray(frame0.image)
    image1 = rgb2gray(frame1.image)
    cm = ds.camera_model
    matcher = Matcher()

    # 1. sparse: FAST + BRIEF matches
    f0 = extract_features(jnp.asarray(image0), threshold=FAST_THRESHOLD,
                          max_keypoints=1024)
    f1 = extract_features(jnp.asarray(image1), threshold=FAST_THRESHOLD,
                          max_keypoints=1024)
    n0, n1, _, _ = matched_normalized(cm, f0, f1, matcher)
    sparse_points, _ = triangulate(frame0.pose, frame1.pose, n0, n1)
    report("sparse feature triangulation", sparse_points)

    # 2. dense match: BRIEF at curvature extrema
    d0 = extract_dense_features(image0)
    d1 = extract_dense_features(image1)
    n0, n1, kp0, kp1 = matched_normalized(cm, d0, d1, matcher)
    dense_points, _ = triangulate(frame0.pose, frame1.pose, n0, n1)
    report("dense match triangulation", dense_points)

    # 3. dense track: affine flow + extrema hill climb
    flow01 = estimate_affine_transform(jnp.asarray(kp0), jnp.asarray(kp1))
    all0, mask0 = extract_curvature_extrema(jnp.asarray(image0),
                                            percentile=95.0,
                                            max_keypoints=4096)
    all0 = np.asarray(all0)[np.asarray(mask0)]
    predicted = np.asarray(flow01(jnp.asarray(all0)))
    inside = np.asarray(is_in_image_range(jnp.asarray(predicted),
                                          image1.shape))
    tracker = ExtremaTracker(compute_image_curvature(jnp.asarray(image1)),
                             lambda_=10.0)
    tracked = np.asarray(tracker.optimize(jnp.asarray(predicted[inside])))
    track_points, _ = triangulate(
        frame0.pose, frame1.pose,
        cm.normalize(jnp.asarray(all0[inside])),
        cm.normalize(jnp.asarray(tracked)))
    report("dense track triangulation", track_points)

    if args.plot:
        from tadataka_tpu.viz import plot_map
        plot_map([frame0.pose, frame1.pose], track_points)


if __name__ == "__main__":
    main()
