"""Stage-level profile of update_depth_sweep + flag histogram."""

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
    warp_plane_stack, _key_patch_stack, ssd_search, update_depth_sweep)
from tadataka_tpu.flags import Flag


def timeit(fn, *args, n_warmup=2, n_iter=10, **kw):
    for _ in range(n_warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    H, W = g0.shape
    f32 = jnp.float32
    S = 64
    keyframe, refframes = kf, refs
    R_frames = refs.image.shape[0]

    prior = jnp.asarray(prior)
    variance = jnp.asarray(variance)
    agej = jnp.asarray(age)

    # flag histogram of the full sweep
    d, v, f = update_depth_sweep(keyframe, refframes, agej, prior, variance,
                                 params, n_planes=S)
    f = np.asarray(f)
    for flag in Flag:
        frac = (f == int(flag)).mean()
        if frac > 0:
            print(f"  {flag.name:34s} {frac:8.4f}")

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
    def warps(img, T_rk, qs):
        return warp_plane_stack(img, T_rk, qs, keyframe.focal_length,
                                keyframe.offset, refframes.focal_length[0],
                                refframes.offset[0])

    V = warps(refframes.image[0], T_rk_all[0], qs)
    print(f"plane warps (scan) : "
          f"{timeit(warps, refframes.image[0], T_rk_all[0], qs)*1e3:8.2f} ms")

    @jax.jit
    def keypatch(img, step_map, dx, dy):
        return _key_patch_stack(img, keyframe.focal_length, step_map, dx, dy)

    sm = geo.key_step_size.reshape(H, W)
    dxm = -geo.key_dir_x.reshape(H, W)
    dym = -geo.key_dir_y.reshape(H, W)
    K = keypatch(keyframe.image, sm, dxm, dym)
    print(f"key patch warps    : "
          f"{timeit(keypatch, keyframe.image, sm, dxm, dym)*1e3:8.2f} ms")

    mlo = jnp.zeros((H, W), f32)
    mhi = jnp.full((H, W), float(S - 5), f32)

    @jax.jit
    def search_pallas(V, K, mlo, mhi):
        return ssd_search(V, K, mlo, mhi, use_pallas=True)

    @jax.jit
    def search_xla(V, K, mlo, mhi):
        return ssd_search(V, K, mlo, mhi, use_pallas=False)

    search_pallas(V, K, mlo, mhi)
    print(f"ssd search pallas  : "
          f"{timeit(search_pallas, V, K, mlo, mhi)*1e3:8.2f} ms")
    search_xla(V, K, mlo, mhi)
    print(f"ssd search xla     : "
          f"{timeit(search_xla, V, K, mlo, mhi)*1e3:8.2f} ms")

    print(f"full sweep         : "
          f"{timeit(update_depth_sweep, keyframe, refframes, agej, prior, variance, params, n_planes=S)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
