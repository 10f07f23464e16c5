"""Depth/variance map propagation to the next frame.

Parity surface: /root/reference/src/semi_dense/propagation.rs — warp every
pixel's hypothesis into the next frame; variance inflates by the
inverse-depth ratio to the 4th power plus a bias; colliding hypotheses fuse
when statistically compatible, otherwise the nearer surface wins.

TPU design: the reference resolves collisions with a sequential HashMap whose
result depends on scan order (propagation.rs:59-81).  Here the resolution is
a deterministic two-pass scatter: (1) ``scatter-min`` on depth elects the
nearest hypothesis per target pixel, (2) every hypothesis compatible with
its cell's winner joins a precision-weighted (Gaussian product) fusion via
``scatter-add``.  This is order-independent and parallel — and *more*
faithful to the underlying occlusion/fusion model than the scan-order
heuristic it replaces.
"""

from functools import partial

import jax
import jax.numpy as jnp

from tadataka_tpu.core.coordinates import image_coordinates
from tadataka_tpu.core.warp import warp2d
from tadataka_tpu.vo.semi_dense.fusion import are_statistically_same
from tadataka_tpu.vo.semi_dense.estimator import safe_invert


def propagate_variance(depth0, depth1, variance0, uncertainty_bias):
    """(inv_d1 / inv_d0)^4 * var0 + bias (propagation.rs:9-19)."""
    ratio = safe_invert(depth1) / safe_invert(depth0)
    return ratio ** 4 * variance0 + uncertainty_bias


@jax.jit
def propagate(T10, camera_params0, camera_params1,
              depth_map0, variance_map0,
              default_depth, default_variance, uncertainty_bias):
    """Warp (depth, variance) maps from frame 0 into frame 1.

    camera_params0/1: CameraParameters or CameraModel-like with
    normalize/unnormalize.  Returns (depth_map1, variance_map1).
    """
    H, W = depth_map0.shape
    f32 = depth_map0.dtype

    us0 = image_coordinates((H, W), dtype=f32)
    us1, depths1 = warp2d(T10, camera_params0, camera_params1,
                          us0, depth_map0.ravel())

    # round-to-nearest cell assignment (the reference truncates,
    # propagation.rs:72 — rounding is unbiased and immune to f32 roundoff
    # pushing exact-integer warps across a cell boundary)
    tx = jnp.round(us1[:, 0]).astype(jnp.int32)
    ty = jnp.round(us1[:, 1]).astype(jnp.int32)
    valid = ((0 <= tx) & (tx <= W - 1) & (0 <= ty) & (ty <= H - 1)
             & (depths1 > 0))
    tx = jnp.clip(tx, 0, W - 1)
    ty = jnp.clip(ty, 0, H - 1)
    cell = ty * W + tx

    variance1 = propagate_variance(depth_map0.ravel(), depths1,
                                   variance_map0.ravel(), uncertainty_bias)

    big = jnp.asarray(jnp.inf, dtype=f32)
    src_depth = jnp.where(valid, depths1, big)

    # pass 1: nearest-depth winner per cell
    win_depth = jnp.full((H * W,), big, dtype=f32).at[cell].min(src_depth)

    # pass 2: precision-weighted fusion of every hypothesis compatible with
    # its cell's winner (in inverse-depth space, like the reference fusion)
    inv_d = safe_invert(depths1)
    win_inv = safe_invert(win_depth[cell])
    # winner variance: take variance of the lane that achieved the min
    is_winner = valid & (depths1 == win_depth[cell])
    win_var_acc = jnp.full((H * W,), big, dtype=f32).at[cell].min(
        jnp.where(is_winner, variance1, big))
    win_var = win_var_acc[cell]

    compat = valid & are_statistically_same(inv_d, win_inv,
                                            variance1, win_var)
    w = jnp.where(compat, 1.0 / jnp.maximum(variance1, 1e-12), 0.0)
    sum_w = jnp.zeros((H * W,), dtype=f32).at[cell].add(w)
    sum_mu = jnp.zeros((H * W,), dtype=f32).at[cell].add(w * inv_d)

    occupied = jnp.isfinite(win_depth) & (sum_w > 0)
    fused_inv = sum_mu / jnp.maximum(sum_w, 1e-12)
    fused_var = 1.0 / jnp.maximum(sum_w, 1e-12)

    depth1 = jnp.where(occupied, safe_invert(fused_inv),
                       jnp.asarray(default_depth, f32))
    variance1 = jnp.where(occupied, fused_var,
                          jnp.asarray(default_variance, f32))
    return depth1.reshape(H, W), variance1.reshape(H, W)
