"""Curvature-extrema hill climb (VITAMIN-E local extrema correction).

Parity surface: /root/reference/tadataka/flow_estimation/extrema_tracker.py —
per keypoint, repeatedly step to the best of the 3x3 neighborhood of
curvature + lambda * (1 - GemanMcClure(drift)), <= 20 iterations, stopping at
a local maximum.  The per-keypoint Python loop becomes one vmapped
``fori_loop`` with a done-latch; out-of-image keypoints pass through.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tadataka_tpu.core.image_range import is_in_image_range

# 3x3 neighborhood offsets, row-major like the reference
_NEIGHBORS = jnp.array([
    [-1, -1], [0, -1], [1, -1],
    [-1, 0], [0, 0], [1, 0],
    [-1, 1], [0, 1], [1, 1],
], dtype=jnp.int32)


class GemanMcClure(NamedTuple):
    sigma_squared: float

    def compute(self, p):
        u = jnp.sum(p * p, axis=-1)
        return u / (u + self.sigma_squared)


class ExtremaTracker:
    """Correct keypoints to nearby curvature maxima."""

    def __init__(self, image_curvature, lambda_, regularizer=None,
                 max_iter=20, subpixel=True):
        if regularizer is None:
            regularizer = GemanMcClure(3.0 ** 2)
        self.image_shape = image_curvature.shape
        # -inf border so the climb cannot step outside (reference pads)
        self.curvature = jnp.pad(image_curvature, 1,
                                 constant_values=-jnp.inf)
        self.regularizer = regularizer
        self.lambda_ = lambda_
        self.max_iter = max_iter
        # subpixel: replace the carried-over fractional part (the reference
        # keeps the affine-flow prediction's fraction, which encodes no
        # measurement) with a parabolic fit on the curvature around the
        # landed extremum — upgrade, matters for small-baseline triangulation
        self.subpixel = subpixel

    def optimize(self, initial_coordinates):
        """(K, 2) float coords in [x, y] -> corrected coords (same shape).

        The fractional part rides along unchanged, like the reference
        (extrema_tracker.py:86-98).
        """
        coords = jnp.asarray(initial_coordinates)
        rounded = jnp.round(coords)
        frac = coords - rounded
        valid = is_in_image_range(rounded, self.image_shape)

        p0 = rounded.astype(jnp.int32) + 1  # padded-coordinate frame
        curvature = self.curvature
        lam = self.lambda_
        reg = self.regularizer
        max_iter = self.max_iter

        def climb_one(p_init):
            def body(_, state):
                p, done = state
                px, py = p[0], p[1]
                patch = jax.lax.dynamic_slice(curvature,
                                              (py - 1, px - 1), (3, 3))
                drift = (p - p_init).astype(patch.dtype)
                ddp = _NEIGHBORS.astype(patch.dtype)
                R = 1.0 - reg.compute(drift + ddp)
                # patch is [y, x]; neighbor list is [x, y] — index rows as
                # (dy + 1) * 3 + (dx + 1)
                flat_idx = (_NEIGHBORS[:, 1] + 1) * 3 + (_NEIGHBORS[:, 0] + 1)
                energy = patch.ravel()[flat_idx] + lam * R
                step = _NEIGHBORS[jnp.argmax(energy)]
                is_center = jnp.all(step == 0)
                p_new = jnp.where(done | is_center, p, p + step)
                return p_new, done | is_center

            p_final, _ = jax.lax.fori_loop(
                0, max_iter, body, (p_init, jnp.asarray(False)))
            return p_final

        landed = jax.vmap(climb_one)(p0)
        corrected = jnp.where(valid[:, None],
                              (landed - 1).astype(coords.dtype), rounded)
        if not self.subpixel:
            return corrected + frac

        def subpixel_one(p):
            px, py = p[0], p[1]
            patch = jax.lax.dynamic_slice(curvature, (py - 1, px - 1), (3, 3))

            def parabola(cm, c0, cp):
                denom = cm - 2.0 * c0 + cp
                off = 0.5 * (cm - cp) / jnp.where(
                    jnp.abs(denom) < 1e-12, 1e-12, denom)
                off = jnp.where(jnp.isfinite(off), off, 0.0)
                return jnp.clip(off, -0.5, 0.5)

            dx = parabola(patch[1, 0], patch[1, 1], patch[1, 2])
            dy = parabola(patch[0, 1], patch[1, 1], patch[2, 1])
            return jnp.stack([dx, dy])

        offsets = jax.vmap(subpixel_one)(landed).astype(coords.dtype)
        offsets = jnp.where(valid[:, None], offsets, frac)
        return corrected + offsets
