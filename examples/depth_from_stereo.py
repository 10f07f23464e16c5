"""Depth estimation from a stereo pair via the semi-dense epipolar kernel.

Counterpart of the reference's examples/estimate_depth_from_stereo.py.
"""

import argparse

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.camera import CameraParameters
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.flags import Flag
from tadataka_tpu.utils.observability import flag_stats
from tadataka_tpu.vo.semi_dense import (
    SemiDenseParams, make_frame, update_depth)
from tadataka_tpu.vo.semi_dense.frame import stack_frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    H, W = 120, 160
    FOCAL = (120.0, 120.0)
    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.zeros(3), jnp.array([0.5, 0.0, 0.0]))]
    ds = multi_plane_scene(n_frames=2, image_shape=(H, W),
                           focal_length=FOCAL, poses=poses)
    key, ref = ds[0], ds[1]

    cam = CameraParameters.create(FOCAL, (W / 2, H / 2))
    keyframe = make_frame(cam, key.image, key.pose.T)
    refframes = stack_frames([make_frame(cam, ref.image, ref.pose.T)])
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)

    gt = np.asarray(key.depth_map)
    rng = np.random.default_rng(0)
    prior = jnp.asarray(gt + rng.uniform(-2, 2, gt.shape).astype(np.float32))
    variance = 0.05 * jnp.ones((H, W))
    age = jnp.ones((H, W), dtype=jnp.int32)

    depth, variance, flags = update_depth(keyframe, refframes, age,
                                          prior, variance, params)

    stats = flag_stats(flags)
    success = np.asarray(flags) == int(Flag.SUCCESS)
    err = np.abs(np.asarray(depth) - gt)[success]
    print("flag histogram:", {k: v for k, v in stats.items() if v})
    print(f"success fraction: {success.mean():.3f}")
    print(f"median |depth - gt| on success: {np.median(err):.4f}")

    if args.plot:
        from tadataka_tpu.viz import plot_depth_dashboard
        plot_depth_dashboard(key.image, depth, variance, flags, gt_depth=gt)


if __name__ == "__main__":
    main()
