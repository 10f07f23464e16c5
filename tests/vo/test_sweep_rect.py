"""Rectified disparity sweep + host planner tests.

Synthetic scenes with exact GT; the rect path must match the scattered
estimator's semantics and beat plane quantization via subpixel parabola.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tadataka_tpu.flags import Flag
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.camera import CameraParameters
from tadataka_tpu.dataset import PlaneSceneDataset
from tadataka_tpu.vo.semi_dense import (
    SemiDenseParams, make_frame, update_depth)
from tadataka_tpu.vo.semi_dense.frame import stack_frames
from tadataka_tpu.vo.semi_dense.rectify import (
    make_rectification, baseline_flip, rectification_feasible)
from tadataka_tpu.vo.semi_dense.sweep_rect import update_depth_rect
from tadataka_tpu.vo.semi_dense.fast import plan_update, update_depth_fast

H, W = 64, 128
FOCAL = (120.0, 120.0)    # higher focal -> usable disparity resolution

PARAMS = SemiDenseParams.create(
    min_depth=2.0, max_depth=50.0, geo_coeff=0.01, photo_coeff=0.01,
    ref_step_size=0.002, min_gradient=0.01)


def _scene(t, rotvec=(0.0, 0.0, 0.0)):
    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.asarray(rotvec, jnp.float32),
                              jnp.asarray(t, jnp.float32))]
    dataset = PlaneSceneDataset(n_frames=2, image_shape=(H, W),
                                focal_length=FOCAL, poses=poses,
                                plane_origin=(0.0, 0.0, 10.0),
                                plane_normal=(0.05, -0.02, -1.0))
    key, ref = dataset[0], dataset[1]
    cam = CameraParameters.create(FOCAL, (W / 2, H / 2))
    keyframe = make_frame(cam, key.image, key.pose.T)
    refframe = make_frame(cam, ref.image, ref.pose.T)
    return key, keyframe, stack_frames([refframe])


def test_rectification_geometry():
    """Rectified correspondence: x_ref = x_key - fB q on equal rows."""
    from tadataka_tpu.core.transforms import inv_motion_matrix
    from tadataka_tpu.vo.semi_dense.estimator import _warp_point
    key, kf, refs = _scene((0.4, 0.1, 0.05), rotvec=(0.01, -0.02, 0.005))
    T_rk = inv_motion_matrix(refs.transform_wf[0]) @ kf.transform_wf
    flip = baseline_flip(np.asarray(T_rk))
    rect = make_rectification(T_rk, kf.focal_length, kf.offset,
                              refs.focal_length[0], refs.offset[0], flip)
    f = np.asarray(kf.focal_length)
    c = np.asarray(kf.offset)
    Hk = np.asarray(rect.H_key)
    Hr = np.asarray(rect.H_ref)
    fB = float(rect.fB)
    sgn = -1.0 if flip else 1.0

    rng = np.random.default_rng(0)
    for _ in range(20):
        u = rng.uniform([10, 10], [W - 10, H - 10])
        depth = rng.uniform(4.0, 30.0)
        q = 1.0 / depth
        # original correspondence via the per-pixel warp
        x_key = (u - c) / f
        x_ref, _ = _warp_point(T_rk, jnp.asarray(x_key, jnp.float32),
                               jnp.float32(depth))
        u_ref = np.asarray(x_ref) * f + c
        # both mapped to rect space
        pk = Hk @ [u[0], u[1], 1.0]
        pr = Hr @ [u_ref[0], u_ref[1], 1.0]
        pk, pr = pk[:2] / pk[2], pr[:2] / pr[2]
        assert abs(pk[1] - pr[1]) < 0.1, "rows must align"
        # disparity = sgn * fB * v_z * q with v_z the depth re-projection
        # factor of the rectifying rotation at this pixel
        vzc = np.asarray(rect.vz)
        xr_n = (pk - c) / f
        v_z = vzc[0] * xr_n[0] + vzc[1] * xr_n[1] + vzc[2]
        np.testing.assert_allclose(pk[0] - pr[0], sgn * fB * v_z * q,
                                   rtol=1e-3, atol=0.05)


def test_feasibility_gate():
    f = np.asarray([120.0, 120.0])
    c = np.asarray([64.0, 32.0])
    lateral = np.eye(4)
    lateral[:3, 3] = [-0.5, 0.0, 0.0]
    ok, flip = rectification_feasible(lateral, f, c, f, c, (H, W), 16, 16)
    assert ok and not flip
    leftward = np.eye(4)
    leftward[:3, 3] = [0.5, 0.0, 0.0]     # ref center at -x
    ok, flip = rectification_feasible(leftward, f, c, f, c, (H, W), 16, 16)
    assert ok and flip
    forward = np.eye(4)
    forward[:3, 3] = [0.0, 0.0, 0.5]
    ok, _ = rectification_feasible(forward, f, c, f, c, (H, W), 16, 16)
    assert not ok


def _run_rect(scene, prior, prior_var, n_planes=64, flips=(False,)):
    key, kf, refs = scene
    age = jnp.ones((H, W), jnp.int32)
    return update_depth_rect(kf, refs, age, jnp.asarray(prior),
                             jnp.asarray(prior_var), PARAMS,
                             n_planes=n_planes, flips=flips,
                             max_dx=16, max_dy=16)


def test_rect_improves_depth_lateral():
    scene = _scene((0.5, 0.0, 0.0))
    gt = np.asarray(scene[0].depth_map)
    rng = np.random.default_rng(7)
    prior = (gt + rng.uniform(-2, 2, gt.shape)).astype(np.float32)
    prior_var = 0.05 * np.ones_like(prior)
    depth, variance, flags = _run_rect(scene, prior, prior_var)
    flags = np.asarray(flags)
    depth = np.asarray(depth)
    success = flags == int(Flag.SUCCESS)
    assert success.mean() > 0.3, f"too few SUCCESS: {success.mean()}"
    err_new = np.abs(depth - gt)[success]
    err_prior = np.abs(prior - gt)[success]
    assert np.median(err_new) < np.median(err_prior)
    assert np.median(err_new) < 0.5
    v = np.asarray(variance)[success]
    assert np.all(v > 0) and np.all(np.isfinite(v))


def test_rect_flip_branch():
    """Baseline toward -x exercises the flipped sweep."""
    scene = _scene((-0.5, 0.0, 0.0))
    from tadataka_tpu.core.transforms import inv_motion_matrix
    T_rk = inv_motion_matrix(scene[2].transform_wf[0]) @ scene[1].transform_wf
    assert baseline_flip(np.asarray(T_rk))
    gt = np.asarray(scene[0].depth_map)
    prior = (gt + 1.5).astype(np.float32)
    prior_var = 0.05 * np.ones_like(prior)
    depth, _, flags = _run_rect(scene, prior, prior_var, flips=(True,))
    success = np.asarray(flags) == int(Flag.SUCCESS)
    assert success.mean() > 0.3
    err = np.abs(np.asarray(depth) - gt)[success]
    assert np.median(err) < 0.5


def test_rect_matches_scatter():
    scene = _scene((0.5, 0.05, 0.0), rotvec=(0.0, 0.0, 0.01))
    key, kf, refs = scene
    gt = np.asarray(key.depth_map)
    rng = np.random.default_rng(9)
    prior = (gt + rng.uniform(-1.5, 1.5, gt.shape)).astype(np.float32)
    prior_var = 0.05 * np.ones_like(prior)
    age = jnp.ones((H, W), jnp.int32)

    d_rect, _, f_rect = _run_rect(scene, prior, prior_var)
    d_scat, _, f_scat = update_depth(kf, refs, age, jnp.asarray(prior),
                                     jnp.asarray(prior_var), PARAMS,
                                     n_ref_samples=64)
    both = (np.asarray(f_rect) == 0) & (np.asarray(f_scat) == 0)
    assert both.mean() > 0.2
    dd = np.abs(np.asarray(d_rect) - np.asarray(d_scat))[both]
    assert np.median(dd) < 0.5
    e_rect = np.median(np.abs(np.asarray(d_rect) - gt)[both])
    e_scat = np.median(np.abs(np.asarray(d_scat) - gt)[both])
    assert e_rect < e_scat * 1.2


def test_rect_flag_semantics():
    scene = _scene((0.5, 0.0, 0.0))
    gt = np.asarray(scene[0].depth_map)
    prior = gt.copy().astype(np.float32)
    prior[20, 20] = -5.0
    prior_var = 0.05 * np.ones_like(prior)
    age = np.ones((H, W), np.int32)
    age[10, 10] = 0
    key, kf, refs = scene
    depth, _, flags = update_depth_rect(
        kf, refs, jnp.asarray(age), jnp.asarray(prior),
        jnp.asarray(prior_var), PARAMS, n_planes=64, flips=(False,),
        max_dx=16, max_dy=16)
    flags = np.asarray(flags)
    assert flags[10, 10] == int(Flag.NOT_PROCESSED)
    assert flags[20, 20] == int(Flag.NEGATIVE_PRIOR_DEPTH)


def _budget(b):
    return (b, b) if isinstance(b, int) else tuple(b)


class TestPlanner:
    def test_wide_lateral_picks_rect(self):
        # baseline wide enough that the tent budget cap is exceeded;
        # rect handles any lateral baseline with per-plane const shifts
        _, kf, refs = _scene((1.5, 0.0, 0.0))
        plan = plan_update(kf, refs, PARAMS)
        assert plan.path == 'rect'
        assert plan.flips == (False,)
        assert plan.n_planes[0] >= 16

    def test_small_lateral_prefers_tent(self):
        # full-coverage tent (key-grid measurement) outranks rect when
        # every refframe fits the tent budget
        _, kf, refs = _scene((0.5, 0.0, 0.0))
        plan = plan_update(kf, refs, PARAMS)
        assert plan.path == 'tent'
        assert plan.redirect == (0,)

    def test_forward_picks_tent(self):
        _, kf, refs = _scene((0.02, 0.0, 0.1), rotvec=(0.0, 0.005, 0.0))
        plan = plan_update(kf, refs, PARAMS)
        assert plan.path == 'tent'
        assert all(min(_budget(b)) > 0 for b in plan.warp_budget)

    def test_dispatch_runs_all_paths(self):
        for t, rot in [((0.5, 0.0, 0.0), (0, 0, 0)),
                       ((0.02, 0.0, 0.1), (0, 0.005, 0))]:
            scene = _scene(t, rotvec=rot)
            key, kf, refs = scene
            gt = np.asarray(key.depth_map)
            prior = jnp.asarray((gt + 1.0).astype(np.float32))
            pv = jnp.full((H, W), 0.05, jnp.float32)
            age = jnp.ones((H, W), jnp.int32)
            d, v, f = update_depth_fast(kf, refs, age, prior, pv, PARAMS)
            assert d.shape == (H, W)
            assert np.isfinite(np.asarray(d)).all()


def test_tent_sweep_accuracy_forward_motion():
    """General-motion tent path on a forward-dominant baseline."""
    scene = _scene((0.05, 0.02, 0.25), rotvec=(0.005, -0.01, 0.0))
    key, kf, refs = scene
    plan = plan_update(kf, refs, PARAMS)
    assert plan.path == 'tent'
    gt = np.asarray(key.depth_map)
    rng = np.random.default_rng(11)
    prior = jnp.asarray((gt + rng.uniform(-1, 1, gt.shape)).astype(np.float32))
    pv = jnp.full((H, W), 0.02, jnp.float32)
    age = jnp.ones((H, W), jnp.int32)
    d, v, f = update_depth_fast(kf, refs, age, prior, pv, PARAMS, plan=plan)
    success = np.asarray(f) == int(Flag.SUCCESS)
    # forward-dominant motion: pixels near the in-image epipole have no
    # parallax (REF_EPIPOLAR_TOO_SHORT), so coverage is modest
    assert success.mean() > 0.10

    # fair bar: the scattered reference-semantics estimator on the same
    # scene (the prior here is artificially tight; the reference also
    # overwrites it with the match on SUCCESS)
    d_sc, _, f_sc = update_depth(kf, refs, age, prior, pv, PARAMS,
                                 n_ref_samples=32)
    both = success & (np.asarray(f_sc) == int(Flag.SUCCESS))
    assert both.mean() > 0.05
    e_tent = np.median(np.abs(np.asarray(d) - gt)[both])
    e_scat = np.median(np.abs(np.asarray(d_sc) - gt)[both])
    assert e_tent < e_scat * 1.2
    assert e_tent < 2.0
