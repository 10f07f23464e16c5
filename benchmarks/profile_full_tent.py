"""Incremental bisection of update_depth_sweep's single-jit cost.

Re-implements the sweep body with cut points; each cut compiles as ONE
jit so per-call dispatch overhead is counted once.
"""

import time
from functools import partial
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup
from tadataka_tpu.core.gradients import sobel_x, sobel_y
from tadataka_tpu.core.transforms import inv_motion_matrix
from tadataka_tpu.vo.semi_dense.estimator import (
    pixel_geometry_map, safe_invert, calc_key_epipole)
from tadataka_tpu.vo.semi_dense.hypothesis import clamped_range
from tadataka_tpu.vo.semi_dense.params import N_KEY_SAMPLES
from tadataka_tpu.vo.semi_dense.sweep import (
    plane_homography, warp_plane_stack_tent, _key_patch_stack, ssd_search,
    postprocess_map, update_depth_sweep, EPSILON, _INF)
from tadataka_tpu.vo.semi_dense.fast import plan_update, KEY_BUDGET


def timeit(fn, *args, n_warmup=2, n_iter=20, **kw):
    for _ in range(n_warmup):
        out = fn(*args, **kw)
    float(sum(jnp.sum(o) for o in jax.tree.leaves(out)))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args, **kw)
    float(sum(jnp.sum(o) for o in jax.tree.leaves(out)))
    return (time.perf_counter() - t0) / n_iter


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    H, W = g0.shape
    f32 = jnp.float32
    keyframe, refframes = kf, refs

    prior = jnp.asarray(prior)
    variance = jnp.asarray(variance)
    agej = jnp.asarray(age)

    plan = plan_update(kf, refs, params)
    S = plan.n_planes[0]
    budget = plan.warp_budget[0][1]
    print(f"plan: S={S} budget={budget}")

    @partial(jax.jit, static_argnames=("stage",))
    def run(keyframe, refframes, age_map, prior_depth, prior_variance,
            stage="full"):
        R_frames = refframes.image.shape[0]
        N = H * W
        T_wk = keyframe.transform_wf
        T_rk_all = jax.vmap(lambda T_wr: inv_motion_matrix(T_wr) @ T_wk)(
            refframes.transform_wf)
        e_key_all = jax.vmap(lambda T_wr: calc_key_epipole(T_wk, T_wr))(
            refframes.transform_wf)
        gx = sobel_x(keyframe.image, mode="zero")
        gy = sobel_y(keyframe.image, mode="zero")
        xs = jnp.arange(W, dtype=f32)
        ys = jnp.arange(H, dtype=f32)
        X, Y = jnp.meshgrid(xs, ys)
        us_x, us_y = X.ravel(), Y.ravel()
        age = age_map.ravel().astype(jnp.int32)
        prior_d = prior_depth.ravel().astype(f32)
        prior_v = prior_variance.ravel().astype(f32)
        prior_inv = safe_invert(prior_d)
        key_shape = keyframe.image.shape
        ref_shape = refframes.image.shape[1:]
        r = 0

        geo = pixel_geometry_map(
            us_x, us_y, prior_inv, prior_v, T_rk_all[r], e_key_all[r],
            keyframe.focal_length, keyframe.offset, key_shape,
            refframes.focal_length[r], refframes.offset[r], ref_shape,
            params, S)
        if stage == "A":
            return geo

        q0 = params.min_inv_depth.astype(f32)
        q1 = params.max_inv_depth.astype(f32)
        lo, hi = clamped_range(prior_inv, prior_v, params.min_inv_depth,
                               params.max_inv_depth)
        half_w = N_KEY_SAMPLES // 2

        from tadataka_tpu.core.transforms import get_rotation, get_translation
        Rm = get_rotation(T_rk_all[r])
        tm = get_translation(T_rk_all[r])
        ar0 = Rm[0, 0] * geo.x_key_x + Rm[0, 1] * geo.x_key_y + Rm[0, 2]
        ar1 = Rm[1, 0] * geo.x_key_x + Rm[1, 1] * geo.x_key_y + Rm[1, 2]
        ar2 = Rm[2, 0] * geo.x_key_x + Rm[2, 1] * geo.x_key_y + Rm[2, 2]

        def _wxy(depth):
            z = depth * ar2 + tm[2]
            return ((depth * ar0 + tm[0]) / (z + EPSILON),
                    (depth * ar1 + tm[1]) / (z + EPSILON))

        xa_x, xa_y = _wxy(safe_invert(q1))
        xb_x, xb_y = _wxy(safe_invert(q0))
        step_sweep = jnp.sqrt((xb_x - xa_x) ** 2 + (xb_y - xa_y) ** 2) / (
            S - 2 * half_w - 1)
        ratio = geo.key_step_size / (geo.step + EPSILON)
        key_step_sweep = ratio * step_sweep
        if stage == "arc":
            return geo, key_step_sweep

        step_map = key_step_sweep.reshape(H, W)
        dirx_map = -geo.key_dir_x.reshape(H, W)
        diry_map = -geo.key_dir_y.reshape(H, W)
        K_stack = _key_patch_stack(keyframe.image, keyframe.focal_length,
                                   step_map, dirx_map, diry_map,
                                   budget=KEY_BUDGET)
        key_grad_map = jnp.sqrt(
            jnp.sum(jnp.diff(K_stack, axis=0) ** 2, axis=0))
        if stage == "K":
            return K_stack, key_grad_map

        gate_scale = geo.key_step_size / (key_step_sweep + EPSILON)
        kgrad_post = key_grad_map.ravel() * gate_scale
        ks_post = geo.key_step_size

        dq = (q1 - q0) / (S - 2 * half_w - 1)
        qs = q0 + dq * (jnp.arange(S, dtype=f32) - half_w)
        qs = jnp.maximum(qs, jnp.asarray(EPSILON, f32))
        V = warp_plane_stack_tent(
            refframes.image[r], T_rk_all[r], qs, keyframe.focal_length,
            keyframe.offset, refframes.focal_length[r],
            refframes.offset[r], budget)
        if stage == "V":
            return V

        lo_map = lo.reshape(H, W)
        hi_map = hi.reshape(H, W)
        tol = 0.5 * dq
        mlo = jnp.ceil((lo_map - tol - q0) / dq)
        mhi = jnp.floor((hi_map + tol - q0) / dq)
        bm, ec, ep, en = ssd_search(V, K_stack, mlo, mhi)
        if stage == "ssd":
            return bm, ec, ep, en

        denom = ep - 2.0 * ec + en
        ok = (ep < _INF) & (en < _INF) & (jnp.abs(denom) > EPSILON)
        delta = jnp.where(ok, jnp.clip(0.5 * (ep - en) / jnp.where(
            ok, denom, 1.0), -0.5, 0.5), 0.0)
        q_star_map = q0 + (bm.astype(f32) + delta) * dq
        q_star = jnp.clip(q_star_map.ravel(), lo, hi)
        no_match = (bm < 0).ravel()

        if stage == "qstar":
            return q_star, no_match

        if stage in ("alpha", "var", "flagchain"):
            from tadataka_tpu.core.transforms import (
                get_rotation, get_translation)
            from tadataka_tpu.vo.semi_dense.estimator import _photo_var
            from tadataka_tpu.vo.semi_dense.hypothesis import check_args_flag
            T_rk = T_rk_all[r]
            R = get_rotation(T_rk)
            t = get_translation(T_rk)
            xk_x, xk_y = geo.x_key_x, geo.x_key_y
            r0 = R[0, 0] * xk_x + R[0, 1] * xk_y + R[0, 2]
            r1 = R[1, 0] * xk_x + R[1, 1] * xk_y + R[1, 2]
            r2 = R[2, 0] * xk_x + R[2, 1] * xk_y + R[2, 2]

            def warp_xy(depth):
                z = depth * r2 + t[2]
                return ((depth * r0 + t[0]) / (z + EPSILON),
                        (depth * r1 + t[1]) / (z + EPSILON))

            key_depth = safe_invert(q_star)
            xmin_x, xmin_y = warp_xy(geo.min_depth)
            xmax_x, xmax_y = warp_xy(geo.max_depth)
            ddx = xmax_x - xmin_x
            ddy = xmax_y - xmin_y
            dn = jnp.sqrt(ddx * ddx + ddy * ddy)
            dz = dn == 0.0
            dirx = jnp.where(dz, ddx, ddx / jnp.where(dz, 1.0, dn))
            diry = jnp.where(dz, ddy, ddy / jnp.where(dz, 1.0, dn))
            xr_x, xr_y = warp_xy(key_depth)
            num0 = r2 * t[0] - r0 * t[2]
            den0 = xr_x * t[2] - t[0]
            a_x = dirx * num0 / (den0 * den0 + EPSILON)
            num1 = r2 * t[1] - r1 * t[2]
            den1 = xr_y * t[2] - t[1]
            a_y = diry * num1 / (den1 * den1 + EPSILON)
            alpha = jnp.where(jnp.abs(dirx) > jnp.abs(diry), a_x, a_y)
            if stage == "alpha":
                return alpha
            gx_v = gx.ravel()
            gy_v = gy.ravel()
            ex = xk_x - t[0] / (t[2] + EPSILON)
            ey = xk_y - t[1] / (t[2] + EPSILON)
            en_ = jnp.sqrt(ex * ex + ey * ey)
            ez = en_ == 0.0
            exn = jnp.where(ez, ex, ex / jnp.where(ez, 1.0, en_))
            eyn = jnp.where(ez, ey, ey / jnp.where(ez, 1.0, en_))
            gn = jnp.sqrt(gx_v * gx_v + gy_v * gy_v)
            gzz = gn == 0.0
            gxn = jnp.where(gzz, gx_v, gx_v / jnp.where(gzz, 1.0, gn))
            gyn = jnp.where(gzz, gy_v, gy_v / jnp.where(gzz, 1.0, gn))
            p = exn * gxn + eyn * gyn
            geo_v = jnp.where(p == 0.0, 1.0 / EPSILON,
                              1.0 / (p * p + EPSILON))
            photo = _photo_var(kgrad_post / (ks_post + EPSILON))
            a2 = alpha * alpha
            variance2 = a2 * (params.geo_coeff ** 2 * geo_v
                              + params.photo_coeff ** 2 * photo)
            if stage == "var":
                return variance2
            flag = check_args_flag(q_star, variance2, params.min_inv_depth,
                                   params.max_inv_depth)
            return flag

        if stage == "full_barrier":
            (geo, kgrad_post, ks_post, q_star, no_match) = (
                jax.lax.optimization_barrier(
                    (geo, kgrad_post, ks_post, q_star, no_match)))
        depth, variance_o, flags = postprocess_map(
            q_star, no_match, kgrad_post, ks_post,
            gx.ravel(), gy.ravel(), geo, prior_inv, prior_v,
            T_rk_all[r], age, params=params)
        return depth.reshape(H, W), variance_o.reshape(H, W), flags

    prev = 0.0
    for stage in ("A", "arc", "K", "V", "ssd", "qstar", "full"):
        t = timeit(run, keyframe, refframes, agej, prior, variance, stage=stage)
        print(f"  through {stage:4s}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:6.2f})")
        prev = t

    t = timeit(update_depth_sweep, keyframe, refframes, agej, prior,
               variance, params, n_planes=plan.n_planes,
               warp_budget=plan.warp_budget, key_budget=KEY_BUDGET,
               redirect=plan.redirect)
    print(f"  real update_depth_sweep: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
