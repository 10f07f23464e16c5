"""VITAMIN-E dense tracking demo (counterpart of examples/vitamin_e.py)."""

import argparse

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.vo.vitamin_e import track_sequence, triangulate_tracks


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=4)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.003 * i, 0.0]),
                              jnp.array([0.15 * i, 0.01 * i, 0.0]))
             for i in range(args.frames)]
    ds = multi_plane_scene(n_frames=args.frames, image_shape=(120, 160),
                           focal_length=(120.0, 120.0), poses=poses)
    frames = [ds[i] for i in range(args.frames)]
    images = [f.image for f in frames]

    keypoints = track_sequence(images, lambda_=0.5, patch_size=24,
                               fast_threshold=0.02)
    for i, kf in enumerate(keypoints):
        print(f"frame {i}: {len(kf.ids)} tracked keypoints")

    camera_models = [f.camera_model for f in frames]
    cam_poses = [f.pose.inv() for f in frames]
    points, depths = triangulate_tracks(camera_models, cam_poses, keypoints)
    points = np.asarray(points)
    ok = np.isfinite(points).all(axis=1) & np.all(np.asarray(depths) > 0,
                                                 axis=0)
    print(f"triangulated {ok.sum()} / {len(points)} tracks")

    if args.plot:
        from tadataka_tpu.viz import plot_map
        plot_map([f.pose for f in frames], points[ok])


if __name__ == "__main__":
    main()
