"""Feature-based VO demo (counterpart of examples/animation_feature_based.py)."""

import argparse

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.metrics import absolute_trajectory_error
from tadataka_tpu.vo.feature_based import FeatureBasedVO


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.002 * i, 0.0]),
                              jnp.array([0.25 * i, 0.01 * i, 0.02 * i]))
             for i in range(args.frames)]
    ds = multi_plane_scene(n_frames=args.frames, image_shape=(120, 160),
                           focal_length=(120.0, 120.0), poses=poses)

    vo = FeatureBasedVO(window_size=8, min_matches=12, max_keypoints=512,
                        patch_size=24, fast_threshold=0.02)
    est, gt = [], []
    for i in range(args.frames):
        frame = ds[i]
        pose = vo.estimate(frame)
        if pose is None:
            print(f"frame {i}: tracking failed")
            continue
        est.append(np.asarray(pose.t))
        gt.append(np.asarray(frame.pose.t))
        print(f"frame {i}: t = {np.asarray(pose.t).round(3)}")

    est, gt = np.asarray(est), np.asarray(gt)
    ate = float(absolute_trajectory_error(jnp.asarray(est), jnp.asarray(gt)))
    print(f"ATE (sim3-aligned): {ate:.4f}")

    points, colors = vo.export_points()
    print(f"map: {len(points)} points")

    if args.plot:
        from tadataka_tpu.viz import plot_map
        plot_map([p.inv() for p in vo.export_poses()], points)


if __name__ == "__main__":
    main()
