"""Two-device tracker/mapper pipeline (SURVEY §2.3 PP row)."""

import numpy as np
import jax
import jax.numpy as jnp

from tadataka_tpu.camera import CameraParameters
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.synthetic import multi_plane_scene
from tadataka_tpu.flags import Flag
from tadataka_tpu.vo.semi_dense import SemiDenseParams
from tadataka_tpu.apps import PipelinedSemiDenseVO


def test_pipelined_vo_two_devices():
    H, W = 80, 100
    FOCAL = (80.0, 80.0)
    poses = [Pose.from_rotvec(jnp.array([0.0, 0.002 * i, 0.0]),
                              jnp.array([0.18 * i, 0.01 * i, 0.01 * i]))
             for i in range(5)]
    ds = multi_plane_scene(n_frames=5, image_shape=(H, W),
                           focal_length=FOCAL, poses=poses)
    cam = CameraParameters.create(FOCAL, (W / 2, H / 2))
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    devices = jax.devices()[:2]
    assert len(devices) == 2
    vo = PipelinedSemiDenseVO(
        cam, params=params, default_depth=8.0,
        default_variance=1.0, uncertainty_bias=0.01,
        depth_range=(2.0, 50.0), n_coarse_to_fine=4,
        history_size=4, devices=tuple(devices),
        # GT bootstrap isolates the depth/pipeline behavior (the regular
        # app test does the same)
        initial_pose_fn=lambda a, b: poses[1].inv() * poses[0])
    for i in range(5):
        st = vo.estimate(ds[i])
    st = vo.flush_map()        # complete the final frame's mapper stage

    # the map lives on the mapper device; tracking state on the tracker
    assert list(st.depth_map.devices())[0] == devices[1]
    assert list(vo._track_map[0].devices())[0] == devices[0]

    flags = np.asarray(st.flag_map)
    success = flags == int(Flag.SUCCESS)
    assert success.mean() > 0.15, success.mean()
    gt = np.asarray(ds[4].depth_map)
    err = np.abs(np.asarray(st.depth_map) - gt)[success]
    assert np.median(err) < 1.5, np.median(err)

    # trajectory direction sane (dominant +x motion)
    t_final = np.asarray(vo.finish()[:3, 3])
    assert t_final[0] > 0.2, t_final
