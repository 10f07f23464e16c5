"""1 -> N virtual-device scaling of the two sharded programs (CPU mesh).

Multi-chip TPU hardware is unavailable in this environment, so this bounds
the *communication/partitioning overhead* of the sharded programs on the
8-virtual-device CPU mesh (the same programs the driver dry-runs): perfect
overhead-free sharding would show speedup = min(n_devices, usable cores) and
never a slowdown.  Writes SCALING_CPU.json at the repo root.

Run: python benchmarks/scaling_cpu_mesh.py
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPS = 5


def _time(fn):
    fn()                                    # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def semi_dense_case(n_devices, H=240, W=320):
    from tadataka_tpu.core.pose import Pose
    from tadataka_tpu.camera import CameraParameters
    from tadataka_tpu.dataset import PlaneSceneDataset
    from tadataka_tpu.parallel.mesh import make_mesh
    from tadataka_tpu.parallel.sharded_semi_dense import (
        make_sharded_update_depth)
    from tadataka_tpu.vo.semi_dense import SemiDenseParams, make_frame
    from tadataka_tpu.vo.semi_dense.frame import stack_frames

    FOCAL = (200.0, 200.0)
    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.zeros(3), jnp.array([0.5, 0.0, 0.0]))]
    ds = PlaneSceneDataset(n_frames=2, image_shape=(H, W),
                           focal_length=FOCAL, poses=poses)
    key, ref = ds[0], ds[1]
    cam = CameraParameters.create(FOCAL, (W / 2, H / 2))
    kf = make_frame(cam, key.image, key.pose.T)
    refs = stack_frames([make_frame(cam, ref.image, ref.pose.T)])
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    rng = np.random.default_rng(0)
    gt = np.asarray(key.depth_map)
    prior = jnp.asarray(gt + rng.uniform(-1, 1, gt.shape).astype(np.float32))
    var = 0.05 * jnp.ones((H, W))
    age = jnp.ones((H, W), dtype=jnp.int32)

    mesh = make_mesh(jax.devices()[:n_devices])
    f = make_sharded_update_depth(mesh, (H, W), n_ref_samples=64)
    return _time(lambda: f(kf, refs, age, prior, var, params))


def ba_case(n_devices, n_points=10240, n_viewpoints=8, obs_per_point=3):
    from tadataka_tpu.ba.residuals import transform_project
    from tadataka_tpu.parallel.mesh import make_mesh
    from tadataka_tpu.parallel import distributed_lm_solve

    rng = np.random.default_rng(1)
    points = rng.uniform(-2, 2, (n_points, 3)).astype(np.float32)
    points[:, 2] += 8.0
    rotvecs = rng.uniform(-0.05, 0.05, (n_viewpoints, 3)).astype(np.float32)
    ts = rng.uniform(-0.5, 0.5, (n_viewpoints, 3)).astype(np.float32)
    poses = np.hstack([rotvecs, ts])
    pi_ = np.repeat(np.arange(n_points), obs_per_point)
    vi = rng.integers(0, n_viewpoints, pi_.shape[0]).astype(np.int32)
    proj = jax.vmap(transform_project)
    x_true = np.asarray(proj(jnp.asarray(poses)[vi],
                             jnp.asarray(points)[pi_])).astype(np.float32)
    poses_n = (poses + rng.normal(0, 0.01, poses.shape)).astype(np.float32)
    points_n = (points + rng.normal(0, 0.05, points.shape)).astype(
        np.float32)

    mesh = make_mesh(jax.devices()[:n_devices])
    return _time(lambda: distributed_lm_solve(
        mesh, poses_n, points_n, vi, pi_, x_true, max_iter=5))


def sweep_case(n_devices, H=240, W=320):
    """The r4 production path: column-sharded planned tent sweep + halo
    regularization (zero collectives in the sweep; one ppermute)."""
    from tadataka_tpu.core.pose import Pose
    from tadataka_tpu.camera import CameraParameters
    from tadataka_tpu.dataset.synthetic import multi_plane_scene
    from tadataka_tpu.parallel.mesh import make_mesh
    from tadataka_tpu.parallel.sharded_semi_dense import (
        make_sharded_update_sweep)
    from tadataka_tpu.vo.semi_dense import SemiDenseParams, make_frame
    from tadataka_tpu.vo.semi_dense.fast import plan_update
    from tadataka_tpu.vo.semi_dense.frame import stack_frames

    FOCAL = (200.0, 200.0)
    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.asarray([0.0, 0.004, 0.0]),
                              jnp.asarray([0.25, 0.02, 0.03]))]
    ds = multi_plane_scene(n_frames=2, image_shape=(H, W),
                           focal_length=FOCAL, poses=poses)
    key, ref = ds[0], ds[1]
    cam = CameraParameters.create(FOCAL, (W / 2, H / 2))
    kf = make_frame(cam, key.image, key.pose.T)
    refs = stack_frames([make_frame(cam, ref.image, ref.pose.T)])
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    rng = np.random.default_rng(0)
    gt = np.asarray(key.depth_map)
    prior = jnp.asarray(gt + rng.uniform(-1, 1, gt.shape).astype(np.float32))
    var = 0.05 * jnp.ones((H, W))
    age = jnp.ones((H, W), dtype=jnp.int32)

    plan = plan_update(kf, refs, params)
    assert plan.path == 'tent', plan
    mesh = make_mesh(jax.devices()[:n_devices])
    f = make_sharded_update_sweep(mesh, (H, W), plan, regularize=True,
                                  use_pallas=False)
    return _time(lambda: f(kf, refs, age, prior, var, params))


def main():
    out = {"n_host_cores": os.cpu_count(), "reps": REPS, "cases": {}}
    for name, case in [("semi_dense_240x320", semi_dense_case),
                       ("sweep_fast_240x320", sweep_case),
                       ("distributed_ba_10k", ba_case)]:
        t1 = case(1)
        t8 = case(8)
        # On a host with fewer cores than virtual devices the 8 per-device
        # programs timeshare the cores, so wall-clock speedup is impossible;
        # the meaningful number is the partitioning+collective OVERHEAD:
        # t8/t1 - 1.  Real multi-chip scaling efficiency is bounded above by
        # 1 / (1 + overhead).
        overhead = t8 / t1 - 1.0
        out["cases"][name] = {
            "t_1dev_s": round(t1, 4), "t_8dev_s": round(t8, 4),
            "sharding_overhead_pct": round(100.0 * overhead, 1),
            "scaling_efficiency_upper_bound_pct":
                min(round(100.0 / max(1.0 + overhead, 1e-9), 1), 100.0),
        }
        print(name, out["cases"][name], flush=True)
    root = Path(__file__).resolve().parents[1]
    (root / "SCALING_CPU.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
