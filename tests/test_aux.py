"""Tests for auxiliary subsystems: config, checkpoint, observability,
optimization framework, viz (headless), synthetic point clouds, utils."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import matplotlib
matplotlib.use("Agg")


def test_config_roundtrip(tmp_path):
    from tadataka_tpu.config import PipelineConfig
    cfg = PipelineConfig()
    cfg.dvo.max_iter = 7
    cfg.semi_dense.min_depth = 1.5
    cfg.feature_vo.features.max_keypoints = 256
    path = tmp_path / "config.json"
    cfg.to_json(path)
    loaded = PipelineConfig.from_json(str(path))
    assert loaded.dvo.max_iter == 7
    assert loaded.semi_dense.min_depth == 1.5
    assert loaded.feature_vo.features.max_keypoints == 256


def test_checkpoint_roundtrip(tmp_path):
    from tadataka_tpu.checkpoint import save_pytree, load_pytree
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((3, 2)), "d": 7}}
    path = tmp_path / "state.npz"
    save_pytree(path, tree)
    like = {"a": jnp.zeros(5), "b": {"c": jnp.zeros((3, 2)), "d": 0}}
    loaded = load_pytree(path, like)
    np.testing.assert_allclose(loaded["a"], np.arange(5.0))
    np.testing.assert_allclose(loaded["b"]["c"], np.ones((3, 2)))
    assert int(loaded["b"]["d"]) == 7
    # shape mismatch is an error
    bad = {"a": jnp.zeros(6), "b": {"c": jnp.zeros((3, 2)), "d": 0}}
    with pytest.raises(ValueError):
        load_pytree(path, bad)


def test_checkpoint_vo_state(tmp_path):
    from tadataka_tpu.checkpoint import save_pytree, load_pytree
    from tadataka_tpu.apps.semi_dense_vo import SemiDenseVOState
    from tadataka_tpu.core.pose import Pose
    state = SemiDenseVOState(Pose.identity(), jnp.ones((4, 5)),
                             jnp.ones((4, 5)), jnp.zeros((4, 5), jnp.int32),
                             jnp.zeros((4, 5), jnp.int32))
    path = tmp_path / "vo.npz"
    save_pytree(path, state)
    loaded = load_pytree(path, state)
    np.testing.assert_allclose(loaded.depth_map, np.ones((4, 5)))


def test_metrics_logger(tmp_path):
    from tadataka_tpu.utils.observability import MetricsLogger, flag_stats
    from tadataka_tpu.flags import Flag
    path = tmp_path / "metrics.jsonl"
    logger = MetricsLogger(path=path)
    logger.log_frame(0, fps=10.0, err=0.5)
    logger.log_frame(1, fps=20.0, err=0.3)
    s = logger.summary()
    assert abs(s["fps"] - 15.0) < 1e-9
    assert path.exists() and len(path.read_text().splitlines()) == 2

    flag_map = jnp.zeros((4, 4), dtype=jnp.int32).at[0, 0].set(
        int(Flag.NOT_PROCESSED))
    stats = flag_stats(flag_map)
    assert stats["SUCCESS"] == 15
    assert stats["NOT_PROCESSED"] == 1


def test_optimization_framework(rng):
    """Fit a line with outliers through the generic GN machinery."""
    from tadataka_tpu.optimization import (
        BaseResidual, SumRobustifiedNormError, SquaredRobustifier,
        GemanMcClureRobustifier, GaussNewtonUpdater, Optimizer, Function)

    X = rng.uniform(-1, 1, (50, 1)).astype(np.float32)
    theta_true = np.array([2.0, -1.0], np.float32)
    y = theta_true[0] * X[:, 0] + theta_true[1]
    y = (y + rng.normal(0, 0.01, y.shape)).astype(np.float32)

    class LineModel(Function):
        def compute(self, theta):
            return theta[0] * jnp.asarray(X[:, 0]) + theta[1]

    residual = BaseResidual(jnp.asarray(y), LineModel())
    updater = GaussNewtonUpdater(residual, SquaredRobustifier())
    error = SumRobustifiedNormError(SquaredRobustifier())
    optimizer = Optimizer(updater, residual, error)
    theta = optimizer.optimize(jnp.zeros(2), max_iter=50)
    np.testing.assert_allclose(np.asarray(theta), theta_true, atol=0.05)

    # robustifier weights: GemanMcClure downweights large residuals
    gm = GemanMcClureRobustifier(sigma=1.0)
    w = np.asarray(gm.weights(jnp.array([0.0, 0.1, 10.0])))
    assert w[0] == 0.0  # zero-safe
    assert w[1] > w[2]


def test_cubic_lattice_and_donut():
    from tadataka_tpu.dataset.points import (
        cubic_lattice, donut, generate_translations)
    pts = cubic_lattice(3)
    assert pts.shape == (27, 3)
    omegas, locations, points = donut(4, 8, height=3, point_density=8,
                                      n_viewpoints=10)
    assert omegas.shape == (10, 3)
    assert locations.shape == (10, 3)
    assert points.shape == (3 * 16, 3)

    from scipy.spatial.transform import Rotation
    rotations = Rotation.from_rotvec(omegas).as_matrix()
    ts = generate_translations(rotations, points)
    for R, t in zip(rotations, ts):
        depths = points @ R.T[:, 2] + t[2]
        assert depths.min() >= 2.0 - 1e-9


def test_array_utils(rng):
    from tadataka_tpu.utils.arrays import (
        indices_other_than, merge_dicts, value_list, add_noise,
        break_other_than)
    assert list(indices_other_than(8, [1, 2, 3])) == [0, 4, 5, 6, 7]
    assert merge_dicts({"a": 1}, {"b": 2}) == {"a": 1, "b": 2}
    assert value_list({"a": 1, "b": 2}, ["b", "a"]) == [2, 1]

    desc = np.where(rng.integers(0, 2, (10, 32)), 1.0, -1.0).astype(
        np.float32)
    noisy = add_noise(desc, [0, 1], rng=np.random.default_rng(0))
    assert not np.array_equal(noisy[0], desc[0])
    np.testing.assert_array_equal(noisy[2:], desc[2:])
    kept = break_other_than(desc, [4, 5], rng=np.random.default_rng(0))
    np.testing.assert_array_equal(kept[4:6], desc[4:6])


def test_viz_headless(rng):
    from tadataka_tpu.viz import (
        plot_map, plot_trajectory, plot_matches, plot_depth_dashboard)
    from tadataka_tpu.core.pose import Pose
    points = rng.uniform(-1, 1, (50, 3))
    poses = [Pose.identity(), Pose.from_rotvec(jnp.zeros(3),
                                               jnp.array([1.0, 0, 0]))]
    fig = plot_map(poses, points, show=False)
    assert fig is not None
    fig = plot_trajectory(rng.uniform(0, 1, (5, 3)),
                          rng.uniform(0, 1, (5, 3)), show=False)
    assert fig is not None
    img = rng.uniform(0, 1, (20, 30))
    kp = rng.uniform(0, 19, (8, 2))
    matches = np.stack([np.arange(8), np.arange(8)], axis=1)
    fig = plot_matches(img, img, kp, kp, matches, show=False)
    assert fig is not None
    fig = plot_depth_dashboard(img, img, img, np.zeros((20, 30), int),
                               show=False)
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_animation_viewers_headless():
    from tadataka_tpu.viz import (VOAnimation, FeatureVOAnimation,
                                  TrajectoryOrbitAnimation)
    from tadataka_tpu.apps.dvo_trajectory import DvoTrajectory
    from tadataka_tpu.dataset import PlaneSceneDataset

    ds = PlaneSceneDataset(n_frames=3, image_shape=(48, 64),
                           focal_length=(48.0, 48.0))
    est = DvoTrajectory(ds.camera_model, n_coarse_to_fine=2, max_iter=3)
    anim = VOAnimation(est, ds)
    for i in range(3):
        anim.update(i)
    assert anim.trajectory_pred.shape == (3, 3)
    assert anim.animate() is not None

    # orbit view over the recorded trajectories
    orbit = TrajectoryOrbitAnimation(anim.trajectory_true,
                                     anim.trajectory_pred)
    orbit.update(45)
    assert orbit.animate(frames=4) is not None

    # feature VO drawer drives through the same protocol with a stub
    class _StubVO:
        def __init__(self):
            self.n = 0

        def estimate(self, frame):
            from tadataka_tpu.core.pose import Pose
            self.n += 1
            return Pose.from_rotvec(jnp.zeros(3),
                                    jnp.array([0.1 * self.n, 0.0, 0.0]))

        def export_points(self):
            return np.ones((5, 3)) * self.n

    fanim = FeatureVOAnimation(_StubVO(), ds)
    for i in range(3):
        fanim.update(i)
    assert fanim.trajectory.shape == (3, 3)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_checkpoint_restores_without_template(tmp_path):
    """save_pytree stores leaf key paths, so load_pytree(path) with no
    template rebuilds a nested dict/list skeleton from the file alone."""
    from tadataka_tpu.checkpoint import save_pytree, load_pytree
    tree = {"depth": np.arange(6.0).reshape(2, 3),
            "meta": {"frames": [np.int32(3), np.int32(5)]},
            "pose": np.eye(4, dtype=np.float32)}
    p = str(tmp_path / "state.npz")
    save_pytree(p, tree)

    restored = load_pytree(p)          # no `like` template
    np.testing.assert_array_equal(restored["depth"], tree["depth"])
    np.testing.assert_array_equal(restored["pose"], tree["pose"])
    assert [int(x) for x in restored["meta"]["frames"]] == [3, 5]
