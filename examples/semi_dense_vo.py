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


def tsukuba_frames(n):
    """Real NewTsukuba fixture frames (left camera).  The monocular scale
    is fixed at bootstrap the way the reference does (essential matrix +
    a known scale, examples/semi_dense_vo.py:124-127): here the essential-
    matrix pose is rescaled to the ground-truth first-step length."""
    from tadataka_tpu.dataset.image_io import rgb2gray
    from tadataka_tpu.dataset.new_tsukuba import NewTsukubaDataset
    from tadataka_tpu.features.brief import extract_features
    from tadataka_tpu.features.matching import Matcher
    from tadataka_tpu.pose_estimation import estimate_pose_change

    ds = NewTsukubaDataset("/root/reference/tests/dataset/new_tsukuba")
    frames = [ds[i][0] for i in range(min(n, len(ds)))]
    p = frames[0].camera_model.camera_parameters
    cam = CameraParameters.create(np.asarray(p.focal_length),
                                  np.asarray(p.offset))
    scale = float(np.linalg.norm(np.asarray(frames[1].pose.t)
                                 - np.asarray(frames[0].pose.t)))
    cm = frames[0].camera_model
    matcher = Matcher()

    def bootstrap(image0, image1):
        f0 = extract_features(jnp.asarray(image0), threshold=20.0 / 255.0,
                              max_keypoints=1024)
        f1 = extract_features(jnp.asarray(image1), threshold=20.0 / 255.0,
                              max_keypoints=1024)
        m = matcher(f0, f1)
        idx = np.asarray(m.indices)[np.asarray(m.mask)]
        pose10 = estimate_pose_change(
            cm.normalize(jnp.asarray(np.asarray(f0.keypoints)[idx[:, 0]])),
            cm.normalize(jnp.asarray(np.asarray(f1.keypoints)[idx[:, 1]])))
        return Pose(pose10.R, scale * pose10.t)

    # frame-to-frame baseline is ~1.2cm -> epipolar segments span only a
    # few pixels; sample at ~0.6px (step 0.001 normalized) and relax the
    # gradient gate accordingly (gradient is measured across the patch)
    params = SemiDenseParams.create(60.0, 1000.0, geo_coeff=0.01,
                                    photo_coeff=0.01, ref_step_size=0.001,
                                    min_gradient=0.05)
    vo = SemiDenseVO(cam, params=params, depth_range=(60.0, 1000.0),
                     default_depth=200.0, default_variance=0.01,
                     uncertainty_bias=1e-4, initial_pose_fn=bootstrap)
    return vo, frames


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
    parser.add_argument("--tsukuba", action="store_true",
                        help="run on the real NewTsukuba fixture frames")
    parser.add_argument("--freiburg", type=int, default=1)
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    if args.tum:
        vo, frames = tum_frames(args.tum, args.freiburg, args.frames)
    elif args.tsukuba:
        vo, frames = tsukuba_frames(args.frames)
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
