"""DVO trajectory demo (counterpart of examples/dvo_pose_change.py)."""

import argparse

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.metrics import absolute_trajectory_error
from tadataka_tpu.apps import DvoTrajectory


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.003 * i, 0.0]),
                              jnp.array([0.15 * i, 0.01 * i, 0.01 * i]))
             for i in range(args.frames)]
    ds = multi_plane_scene(n_frames=args.frames, image_shape=(120, 160),
                           focal_length=(120.0, 120.0), poses=poses)
    frames = [ds[i] for i in range(args.frames)]

    vo = DvoTrajectory(frames[0].camera_model, weights="huber",
                       n_coarse_to_fine=4)
    for frame in frames:
        vo.estimate(frame)

    est = vo.positions()
    gt = np.stack([np.asarray(f.pose.t) for f in frames])
    ate = float(absolute_trajectory_error(jnp.asarray(est), jnp.asarray(gt),
                                          align=False))
    print("positions:", est.round(4).tolist())
    print(f"ATE (metric, unaligned): {ate:.5f}")

    if args.plot:
        from tadataka_tpu.viz import plot_trajectory
        plot_trajectory(est, gt)


if __name__ == "__main__":
    main()
