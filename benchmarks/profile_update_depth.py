"""Stage-level profile of semi-dense update_depth on the chip.

Times each stage of the 3-stage pipeline in isolation (jitted, with
donated/dead-code-proof outputs) so we know where the milliseconds go
before optimizing.  Run: python benchmarks/profile_update_depth.py
"""

import time
from functools import partial
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup, N_REF_SAMPLES
from tadataka_tpu.flags import Flag
from tadataka_tpu.core.gradients import sobel_x, sobel_y
from tadataka_tpu.core.transforms import inv_motion_matrix
from tadataka_tpu.vo.semi_dense.estimator import (
    _pixel_geometry, _pixel_estimate, _key_coords, _ref_coords,
    _interp_image_xy, _interp_stack_xy, calc_key_epipole, safe_invert,
    PixelGeoScalars)
from tadataka_tpu.vo.semi_dense.hypothesis import check_args_flag
from tadataka_tpu.vo.semi_dense.params import N_KEY_SAMPLES


def timeit(fn, *args, n_warmup=2, n_iter=10):
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    H, W = g0.shape
    N = H * W
    f32 = jnp.float32
    n_ref_samples = N_REF_SAMPLES

    keyframe, refframes = kf, refs
    age_map = jnp.asarray(age)
    prior_depth = jnp.asarray(prior)
    prior_variance = jnp.asarray(variance)
    R_frames = refs.image.shape[0]

    T_wk = keyframe.transform_wf
    T_rk_all = jax.vmap(
        lambda T_wr: inv_motion_matrix(T_wr) @ T_wk)(refframes.transform_wf)
    e_key_all = jax.vmap(
        lambda T_wr: calc_key_epipole(T_wk, T_wr))(refframes.transform_wf)

    gx = sobel_x(keyframe.image, mode="zero")
    gy = sobel_y(keyframe.image, mode="zero")

    xs = jnp.arange(W, dtype=f32)
    ys = jnp.arange(H, dtype=f32)
    X, Y = jnp.meshgrid(xs, ys)
    us = jnp.stack([X.ravel(), Y.ravel()], axis=-1)

    age_f = age_map.ravel().astype(jnp.int32)
    prior_d = prior_depth.ravel().astype(f32)
    prior_v = prior_variance.ravel().astype(f32)
    prior_inv = safe_invert(prior_d)
    ridx = jnp.clip(R_frames - age_f, 0, R_frames - 1)

    T_cols = T_rk_all.reshape(R_frames, 16).T[:, ridx]
    e_cols = e_key_all.T[:, ridx]
    rf_cols = refframes.focal_length.T[:, ridx]
    ro_cols = refframes.offset.T[:, ridx]

    key_shape = keyframe.image.shape
    ref_shape = refframes.image.shape[1:]

    @jax.jit
    def stage1(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols):
        return jax.vmap(
            lambda u, pi, pv, T16, e, rf, ro: _pixel_geometry(
                u, pi, pv, T16.reshape(4, 4), e, keyframe.focal_length,
                keyframe.offset, key_shape, rf, ro, ref_shape, params,
                n_ref_samples),
            in_axes=(0, 0, 0, 1, 1, 1, 1), out_axes=0,
        )(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols)

    geo = stage1(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols)
    dt1 = timeit(stage1, us, prior_inv, prior_v, T_cols, e_cols,
                 rf_cols, ro_cols)
    print(f"stage1 geometry vmap      : {dt1*1e3:8.2f} ms")

    @jax.jit
    def stage2(geo, ridx, rf_cols, ro_cols, us):
        steps = jnp.arange(-(N_KEY_SAMPLES // 2), N_KEY_SAMPLES // 2 + 1,
                           dtype=f32)[:, None]
        us_key_x, us_key_y = _key_coords(geo, steps, keyframe.focal_length,
                                         keyframe.offset)
        idx = jnp.arange(n_ref_samples, dtype=f32)[:, None]
        us_ref_x, us_ref_y = _ref_coords(geo, idx, rf_cols[0], rf_cols[1],
                                         ro_cols[0], ro_cols[1])
        key_int = _interp_image_xy(keyframe.image, us_key_x, us_key_y)
        ref_int = _interp_stack_xy(refframes.image, ridx[None, :],
                                   us_ref_x, us_ref_y)
        ux = jnp.clip(us[:, 0].astype(jnp.int32), 0, key_shape[1] - 1)
        uy = jnp.clip(us[:, 1].astype(jnp.int32), 0, key_shape[0] - 1)
        flat_idx = uy * key_shape[1] + ux
        grad = jnp.stack([jnp.take(gx.ravel(), flat_idx, mode="clip"),
                          jnp.take(gy.ravel(), flat_idx, mode="clip")],
                         axis=0)
        return key_int, ref_int, grad

    key_int, ref_int, grad = stage2(geo, ridx, rf_cols, ro_cols, us)
    dt2 = timeit(stage2, geo, ridx, rf_cols, ro_cols, us)
    print(f"stage2 coord+gathers      : {dt2*1e3:8.2f} ms")

    @jax.jit
    def stage3(geo, key_int, ref_int, grad, prior_inv, prior_v, T_cols,
               age_f):
        def post(g, ki, ri, gr, p_inv, p_var, T16, a):
            inv_d, var, flag = _pixel_estimate(g, ki, ri, gr, p_inv, p_var,
                                               T16.reshape(4, 4), params)
            prior_flag = check_args_flag(p_inv, p_var, params.min_inv_depth,
                                         params.max_inv_depth)
            prior_bad = prior_flag != jnp.int32(Flag.SUCCESS)
            not_processed = a == 0
            flag = jnp.where(prior_bad, prior_flag, flag)
            flag = jnp.where(not_processed, jnp.int32(Flag.NOT_PROCESSED),
                             flag)
            keep_prior = jnp.logical_or(not_processed, prior_bad)
            inv_d = jnp.where(keep_prior, p_inv, inv_d)
            var = jnp.where(keep_prior, p_var, var)
            return safe_invert(inv_d), var, flag

        return jax.vmap(post, in_axes=(0, 1, 1, 1, 0, 0, 1, 0),
                        out_axes=0)(geo, key_int, ref_int, grad,
                                    prior_inv, prior_v, T_cols, age_f)

    out = stage3(geo, key_int, ref_int, grad, prior_inv, prior_v, T_cols,
                 age_f)
    dt3 = timeit(stage3, geo, key_int, ref_int, grad, prior_inv, prior_v,
                 T_cols, age_f)
    print(f"stage3 SSD+depth+var vmap : {dt3*1e3:8.2f} ms")

    from tadataka_tpu.vo.semi_dense.estimator import update_depth
    full = partial(update_depth, n_ref_samples=n_ref_samples)
    out = full(keyframe, refframes, age_map, prior_depth, prior_variance,
               params)
    dtf = timeit(full, keyframe, refframes, age_map, prior_depth,
                 prior_variance, params)
    print(f"full update_depth         : {dtf*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
