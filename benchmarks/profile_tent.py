"""Stage-level profile of the TENT fast path (the production config)."""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup
from tadataka_tpu.core.transforms import inv_motion_matrix
from tadataka_tpu.vo.semi_dense.estimator import (
    _pixel_geometry, safe_invert, calc_key_epipole)
from tadataka_tpu.vo.semi_dense.sweep import (
    warp_plane_stack_tent, _key_patch_stack, ssd_search, update_depth_sweep)
from tadataka_tpu.vo.semi_dense.fast import plan_update, KEY_BUDGET


def timeit(fn, *args, n_warmup=2, n_iter=20, **kw):
    for _ in range(n_warmup):
        out = fn(*args, **kw)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args, **kw)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    return (time.perf_counter() - t0) / n_iter


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    H, W = g0.shape
    f32 = jnp.float32
    keyframe, refframes = kf, refs
    R_frames = refs.image.shape[0]

    prior = jnp.asarray(prior)
    variance = jnp.asarray(variance)
    agej = jnp.asarray(age)

    plan = plan_update(kf, refs, params)
    print("plan:", plan)
    S = plan.n_planes[0]
    budget = plan.warp_budget[0][1]

    T_wk = keyframe.transform_wf
    T_rk_all = jax.vmap(
        lambda T_wr: inv_motion_matrix(T_wr) @ T_wk)(refframes.transform_wf)
    e_key_all = jax.vmap(
        lambda T_wr: calc_key_epipole(T_wk, T_wr))(refframes.transform_wf)

    xs = jnp.arange(W, dtype=f32)
    ys = jnp.arange(H, dtype=f32)
    X, Y = jnp.meshgrid(xs, ys)
    us = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    age_f = agej.ravel().astype(jnp.int32)
    prior_inv = safe_invert(prior.ravel())
    prior_v = variance.ravel()
    ridx = jnp.clip(R_frames - age_f, 0, R_frames - 1)
    T_cols = T_rk_all.reshape(R_frames, 16).T[:, ridx]
    e_cols = e_key_all.T[:, ridx]
    rf_cols = refframes.focal_length.T[:, ridx]
    ro_cols = refframes.offset.T[:, ridx]
    key_shape = keyframe.image.shape
    ref_shape = refframes.image.shape[1:]

    @jax.jit
    def stageA(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols):
        return jax.vmap(
            lambda u, pi_, pv, T16, e, rf, ro: _pixel_geometry(
                u, pi_, pv, T16.reshape(4, 4), e, keyframe.focal_length,
                keyframe.offset, key_shape, rf, ro, ref_shape, params, S),
            in_axes=(0, 0, 0, 1, 1, 1, 1), out_axes=0,
        )(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols)

    geo = stageA(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols)
    print(f"stage A geometry   : "
          f"{timeit(stageA, us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols)*1e3:8.2f} ms")

    q0 = params.min_inv_depth.astype(f32)
    q1 = params.max_inv_depth.astype(f32)
    dq = (q1 - q0) / (S - 1)
    qs = q0 + dq * jnp.arange(S, dtype=f32)

    @jax.jit
    def warps_tent(img, T_rk, qs):
        return warp_plane_stack_tent(
            img, T_rk, qs, keyframe.focal_length, keyframe.offset,
            refframes.focal_length[0], refframes.offset[0], budget)

    V = warps_tent(refframes.image[0], T_rk_all[0], qs)
    print(f"plane warps (tent S={S} B={budget}): "
          f"{timeit(warps_tent, refframes.image[0], T_rk_all[0], qs)*1e3:8.2f} ms")

    @jax.jit
    def keypatch(img, step_map, dx, dy):
        return _key_patch_stack(img, keyframe.focal_length, step_map, dx, dy,
                                budget=KEY_BUDGET)

    sm = geo.key_step_size.reshape(H, W)
    dxm = -geo.key_dir_x.reshape(H, W)
    dym = -geo.key_dir_y.reshape(H, W)
    K = keypatch(keyframe.image, sm, dxm, dym)
    print(f"key patch (tent B={KEY_BUDGET}) : "
          f"{timeit(keypatch, keyframe.image, sm, dxm, dym)*1e3:8.2f} ms")

    mlo = jnp.zeros((H, W), f32)
    mhi = jnp.full((H, W), float(S - 5), f32)

    @jax.jit
    def search_pallas(V, K, mlo, mhi):
        return ssd_search(V, K, mlo, mhi, use_pallas=True)

    search_pallas(V, K, mlo, mhi)
    print(f"ssd search pallas  : "
          f"{timeit(search_pallas, V, K, mlo, mhi)*1e3:8.2f} ms")

    t = timeit(update_depth_sweep, keyframe, refframes, agej, prior,
               variance, params, n_planes=plan.n_planes,
               warp_budget=plan.warp_budget, key_budget=KEY_BUDGET,
               redirect=plan.redirect)
    print(f"full tent sweep    : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
