"""jit-vs-eager consistency checks.

SURVEY.md §5: the XLA analogue of the reference's (absent) race detection —
assert that jitted kernels produce the same results as op-by-op eager
execution, catching tracing bugs, stale closures, and donation hazards.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _small_scene():
    from tadataka_tpu.core.pose import Pose
    from tadataka_tpu.camera import CameraParameters
    from tadataka_tpu.dataset import PlaneSceneDataset
    from tadataka_tpu.vo.semi_dense import SemiDenseParams, make_frame
    from tadataka_tpu.vo.semi_dense.frame import stack_frames

    H, W = 24, 32
    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.zeros(3), jnp.array([0.5, 0.0, 0.0]))]
    ds = PlaneSceneDataset(n_frames=2, image_shape=(H, W),
                           focal_length=(24.0, 24.0), poses=poses)
    key, ref = ds[0], ds[1]
    cam = CameraParameters.create((24.0, 24.0), (W / 2, H / 2))
    kf = make_frame(cam, key.image, key.pose.T)
    refs = stack_frames([make_frame(cam, ref.image, ref.pose.T)])
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    gt = np.asarray(key.depth_map)
    rng = np.random.default_rng(0)
    prior = jnp.asarray(gt + rng.uniform(-1, 1, gt.shape).astype(np.float32))
    var = 0.05 * jnp.ones((H, W))
    age = jnp.ones((H, W), dtype=jnp.int32)
    return kf, refs, age, prior, var, params


def test_update_depth_jit_matches_eager():
    """Fusion changes float rounding, which can flip discrete decisions
    (SSD argmin ties, flag boundaries) on isolated pixels — so the check
    is statistical: the overwhelming majority of pixels must agree."""
    from tadataka_tpu.vo.semi_dense.estimator import update_depth
    args = _small_scene()
    d_jit, v_jit, f_jit = update_depth(*args, n_ref_samples=16)
    with jax.disable_jit():
        d_eag, v_eag, f_eag = update_depth(*args, n_ref_samples=16)

    flags_agree = np.asarray(f_jit) == np.asarray(f_eag)
    assert flags_agree.mean() > 0.95, flags_agree.mean()
    close = np.isclose(np.asarray(d_jit), np.asarray(d_eag),
                       rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.95, close.mean()


def test_propagate_jit_matches_eager():
    from tadataka_tpu.vo.semi_dense.propagation import propagate
    from tadataka_tpu.camera import CameraParameters
    kf, refs, age, prior, var, params = _small_scene()
    cam = CameraParameters.create((24.0, 24.0), (16.0, 12.0))
    T10 = jnp.eye(4).at[0, 3].set(0.1)
    jit_out = propagate(T10, cam, cam, prior, var, 10.0, 1.0, 0.01)
    with jax.disable_jit():
        eager_out = propagate(T10, cam, cam, prior, var, 10.0, 1.0, 0.01)
    for a, b in zip(jit_out, eager_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dvo_pyramid_jit_matches_eager():
    from tadataka_tpu.vo.dvo import PoseChangeEstimator
    from tadataka_tpu.dataset import PlaneSceneDataset
    from tadataka_tpu.core.pose import Pose
    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.zeros(3), jnp.array([0.05, 0.0, 0.0]))]
    ds = PlaneSceneDataset(n_frames=2, image_shape=(24, 32),
                           focal_length=(24.0, 24.0), poses=poses)
    f0, f1 = ds[0], ds[1]
    est = PoseChangeEstimator(f0.camera_model, f1.camera_model,
                              n_coarse_to_fine=2, max_iter=5)
    p_jit = est(f0.image, f0.depth_map, f1.image)
    with jax.disable_jit():
        p_eager = est(f0.image, f0.depth_map, f1.image)
    np.testing.assert_allclose(np.asarray(p_jit.t), np.asarray(p_eager.t),
                               rtol=1e-3, atol=1e-4)
