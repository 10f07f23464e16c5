"""VITAMIN-E visual odometry: pose estimation from dense curvature tracks.

Counterpart of /root/reference/examples/vitamin_e_vo.py, completed into a
sequence VO (the reference sketch estimates one essential-matrix pose
between two frames): essential bootstrap, PnP per frame against the
triangulated track map, growing-baseline re-triangulation.

Runs on the real NewTsukuba fixture if available, else a synthetic scene.
"""

import argparse
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.metrics import absolute_trajectory_error
from tadataka_tpu.vo.vitamin_e import VitaminEVO

FIXTURE = Path("/root/reference/tests/dataset/new_tsukuba")


def load_frames(n_frames):
    if FIXTURE.exists():
        from tadataka_tpu.dataset.new_tsukuba import NewTsukubaDataset
        ds = NewTsukubaDataset(FIXTURE)
        frames = [ds[i][0] for i in range(min(n_frames, len(ds)))]
        return ds.camera_model, frames, 20.0 / 255.0
    from tadataka_tpu.core.pose import Pose
    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.003 * i, 0.0]),
                              jnp.array([0.15 * i, 0.01 * i, 0.0]))
             for i in range(n_frames)]
    ds = multi_plane_scene(n_frames=n_frames, image_shape=(120, 160),
                           focal_length=(120.0, 120.0), poses=poses)
    frames = [ds[i] for i in range(n_frames)]
    return frames[0].camera_model, frames, 0.02


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    camera_model, frames, threshold = load_frames(args.frames)
    vo = VitaminEVO(camera_model, fast_threshold=threshold, lambda_=0.5)

    est, gt = [], []
    for i, frame in enumerate(frames):
        pose = vo.estimate(frame.image)
        ok = pose is not None
        print(f"frame {i}: pose "
              f"{np.round(np.asarray(pose.t), 3) if ok else 'LOST'}  "
              f"tracks {len(vo.keypoints[-1].ids)}  map {len(vo.points)}")
        if ok:
            est.append(np.asarray(pose.t))
            gt.append(np.asarray(frame.pose.t))

    if len(est) >= 3:
        ate = float(absolute_trajectory_error(jnp.asarray(np.stack(est)),
                                              jnp.asarray(np.stack(gt))))
        print(f"ATE after Umeyama alignment: {ate:.4f} "
              f"(trajectory span {np.linalg.norm(gt[-1] - gt[0]):.2f})")

    if args.plot:
        from tadataka_tpu.viz import plot_map
        from tadataka_tpu.core.pose import Pose as _P
        pts = np.stack(list(vo.points.values()))
        plot_map([p.inv() for p in vo.poses_cw], pts)


if __name__ == "__main__":
    main()
