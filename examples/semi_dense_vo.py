"""Semi-dense VO demo: DVO tracking + epipolar depth mapping.

Runs on the synthetic scene by default; pass --tum <root> --freiburg N to
run on a TUM RGB-D sequence.  (Counterpart of the reference's
examples/semi_dense_vo.py, on working library APIs.)
"""

import argparse

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.camera import CameraParameters
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.flags import Flag
from tadataka_tpu.utils.observability import MetricsLogger, flag_stats
from tadataka_tpu.vo.semi_dense import SemiDenseParams
from tadataka_tpu.apps import SemiDenseVO


def synthetic_frames(n, H=120, W=160, focal=120.0):
    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.002 * i, 0.0]),
                              jnp.array([0.18 * i, 0.01 * i, 0.01 * i]))
             for i in range(n)]
    ds = multi_plane_scene(n_frames=n, image_shape=(H, W),
                           focal_length=(focal, focal), poses=poses)
    cam = CameraParameters.create((focal, focal), (W / 2, H / 2))
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    vo = SemiDenseVO(cam, params=params, default_depth=8.0,
                     default_variance=1.0, uncertainty_bias=0.01,
                     depth_range=(2.0, 50.0), n_coarse_to_fine=4)
    vo.initial_pose_fn = lambda i0, i1: ds[1].pose.inv() * ds[0].pose
    return vo, [ds[i] for i in range(n)]


def tum_frames(root, freiburg, n):
    from tadataka_tpu.dataset import TumRgbdDataset
    ds = TumRgbdDataset(root, which_freiburg=freiburg)
    frames = [ds[i] for i in range(0, min(n * 3, len(ds)), 3)]
    p = frames[0].camera_model.camera_parameters
    cam = CameraParameters.create(np.asarray(p.focal_length),
                                  np.asarray(p.offset))
    vo = SemiDenseVO(cam, depth_range=(0.3, 10.0), default_depth=2.0,
                     default_variance=1.0, uncertainty_bias=0.05)
    return vo, frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tum", default=None)
    parser.add_argument("--freiburg", type=int, default=1)
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    if args.tum:
        vo, frames = tum_frames(args.tum, args.freiburg, args.frames)
    else:
        vo, frames = synthetic_frames(args.frames)

    logger = MetricsLogger()
    state = None
    for i, frame in enumerate(frames):
        state = vo.estimate(frame)
        metrics = {"t": np.asarray(state.pose_wc.t).tolist()}
        if state.flag_map is not None:
            stats = flag_stats(state.flag_map)
            metrics["success_frac"] = (
                stats["SUCCESS"] / state.flag_map.size)
            if frame.depth_map is not None:
                success = np.asarray(state.flag_map) == int(Flag.SUCCESS)
                err = np.abs(np.asarray(state.depth_map)
                             - np.asarray(frame.depth_map))[success]
                if err.size:
                    metrics["median_depth_err"] = float(np.median(err))
        rec = logger.log_frame(i, **metrics)
        print(rec)

    print("summary:", logger.summary())

    if args.plot and state is not None:
        from tadataka_tpu.viz import plot_depth_dashboard
        plot_depth_dashboard(frames[-1].image, state.depth_map,
                             state.variance_map, state.flag_map,
                             gt_depth=frames[-1].depth_map)


if __name__ == "__main__":
    main()
