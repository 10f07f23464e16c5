"""Micro-profile of update_depth stage 2: which gather is slow?"""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup, N_REF_SAMPLES
from tadataka_tpu.core.gradients import sobel_x, sobel_y
from tadataka_tpu.core.transforms import inv_motion_matrix
from tadataka_tpu.vo.semi_dense.estimator import (
    _pixel_geometry, _key_coords, _ref_coords,
    _interp_image_xy, _interp_stack_xy, calc_key_epipole, safe_invert)
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
    S = N_REF_SAMPLES
    keyframe, refframes = kf, refs
    R_frames = refs.image.shape[0]

    T_wk = keyframe.transform_wf
    T_rk_all = jax.vmap(
        lambda T_wr: inv_motion_matrix(T_wr) @ T_wk)(refframes.transform_wf)
    e_key_all = jax.vmap(
        lambda T_wr: calc_key_epipole(T_wk, T_wr))(refframes.transform_wf)
    xs = jnp.arange(W, dtype=f32)
    ys = jnp.arange(H, dtype=f32)
    X, Y = jnp.meshgrid(xs, ys)
    us = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    age_f = jnp.asarray(age).ravel().astype(jnp.int32)
    prior_inv = safe_invert(jnp.asarray(prior).ravel())
    prior_v = jnp.asarray(variance).ravel()
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
                S),
            in_axes=(0, 0, 0, 1, 1, 1, 1), out_axes=0,
        )(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols)

    geo = jax.block_until_ready(
        stage1(us, prior_inv, prior_v, T_cols, e_cols, rf_cols, ro_cols))

    # --- piece A: key coords + key gather (5, N)
    @jax.jit
    def piece_key(geo):
        steps = jnp.arange(-2, 3, dtype=f32)[:, None]
        kx, ky = _key_coords(geo, steps, keyframe.focal_length,
                             keyframe.offset)
        return _interp_image_xy(keyframe.image, kx, ky)
    piece_key(geo)
    print(f"key coords+gather (5,N)   : {timeit(piece_key, geo)*1e3:8.2f} ms")

    # --- piece B: ref coords only (S, N)
    @jax.jit
    def piece_refcoords(geo, rf_cols, ro_cols):
        idx = jnp.arange(S, dtype=f32)[:, None]
        return _ref_coords(geo, idx, rf_cols[0], rf_cols[1],
                           ro_cols[0], ro_cols[1])
    piece_refcoords(geo, rf_cols, ro_cols)
    print(f"ref coords only (S,N)     : "
          f"{timeit(piece_refcoords, geo, rf_cols, ro_cols)*1e3:8.2f} ms")

    rx, ry = jax.block_until_ready(piece_refcoords(geo, rf_cols, ro_cols))

    # --- piece C: ref gather from precomputed coords (stack version)
    @jax.jit
    def piece_refgather(rx, ry, ridx):
        return _interp_stack_xy(refframes.image, ridx[None, :], rx, ry)
    piece_refgather(rx, ry, ridx)
    print(f"ref stack gather (S,N)    : "
          f"{timeit(piece_refgather, rx, ry, ridx)*1e3:8.2f} ms")

    # --- piece C2: ref gather single-image (no frame index math)
    @jax.jit
    def piece_refgather1(rx, ry):
        return _interp_image_xy(refframes.image[0], rx, ry)
    piece_refgather1(rx, ry)
    print(f"ref 1-img gather (S,N)    : "
          f"{timeit(piece_refgather1, rx, ry)*1e3:8.2f} ms")

    # --- piece C3: raw take, no bilinear (S, N) int indices
    flat = refframes.image[0].ravel()
    idx0 = jnp.clip(ry.astype(jnp.int32), 0, H - 1) * W + \
        jnp.clip(rx.astype(jnp.int32), 0, W - 1)

    @jax.jit
    def piece_take(idx0):
        return jnp.take(flat, idx0, mode="clip")
    piece_take(idx0)
    print(f"raw take (S,N)            : {timeit(piece_take, idx0)*1e3:8.2f} ms")

    # --- piece C4: raw take with row-major fresh iota indices
    idx_rm = jnp.arange(S * N, dtype=jnp.int32).reshape(S, N) % (H * W)
    @jax.jit
    def piece_take_rm(idx_rm):
        return jnp.take(flat, idx_rm, mode="clip")
    piece_take_rm(idx_rm)
    print(f"raw take row-major (S,N)  : "
          f"{timeit(piece_take_rm, idx_rm)*1e3:8.2f} ms")

    # --- piece D: grad gather
    gx = sobel_x(keyframe.image, mode="zero")
    gy = sobel_y(keyframe.image, mode="zero")

    @jax.jit
    def piece_grad(us):
        ux = jnp.clip(us[:, 0].astype(jnp.int32), 0, W - 1)
        uy = jnp.clip(us[:, 1].astype(jnp.int32), 0, H - 1)
        flat_idx = uy * W + ux
        return jnp.stack([jnp.take(gx.ravel(), flat_idx, mode="clip"),
                          jnp.take(gy.ravel(), flat_idx, mode="clip")], 0)
    piece_grad(us)
    print(f"grad gather (2,N)         : {timeit(piece_grad, us)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
