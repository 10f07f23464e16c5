"""Corner detection: FAST segment test and Harris, fixed-K with masks.

Parity surface: /root/reference/tadataka/feature/feature.py:22 (cv2 FAST,
threshold 50 on uint8 — 50/255 on unit-range gray here) — re-implemented as
pure array ops: the 16-pixel Bresenham circle becomes 16 shifted images, the
9-contiguous arc test a cyclic running sum, and selection a global
``top_k`` + 3x3 non-max suppression.  No OpenCV.

Variable keypoint counts become a static capacity K with a validity mask —
the capacity/mask discipline used across the whole feature pipeline.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, clockwise from (0, -3) — (dx, dy)
# (host constant: the shifts must be static for jnp.roll under jit)
_CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]


class Features(NamedTuple):
    keypoints: jnp.ndarray    # (K, 2) [x, y] pixel coords
    descriptors: jnp.ndarray  # (K, D) float +-1, or empty
    mask: jnp.ndarray         # (K,) bool

    @property
    def n_valid(self):
        return jnp.sum(self.mask)


def _shift2d(image, dx, dy):
    """image shifted so out[y, x] = image[y + dy, x + dx] (zero fill)."""
    return jnp.roll(image, shift=(-dy, -dx), axis=(0, 1))


def fast_score(image, threshold=50.0 / 255.0, arc_length=9):
    """FAST-9 corner response: 0 where not a corner, else the sum of
    absolute differences over the contiguous arc (cv2's score flavor)."""
    ring = jnp.stack([_shift2d(image, int(dx), int(dy))
                      for dx, dy in _CIRCLE])           # (16, H, W)
    center = image[None]
    brighter = ring > center + threshold
    darker = ring < center - threshold

    def arc_exists(flags):
        # cyclic: does any window of `arc_length` consecutive ring pixels
        # hold?  double the ring and run a windowed AND via a running sum.
        doubled = jnp.concatenate([flags, flags[:arc_length]], axis=0)
        run = doubled.astype(jnp.int32)
        csum = jnp.cumsum(run, axis=0)
        pad = jnp.zeros_like(csum[:1])
        csum = jnp.concatenate([pad, csum], axis=0)
        window = csum[arc_length:] - csum[:-arc_length]  # (16, H, W)
        return jnp.any(window == arc_length, axis=0)

    is_corner = jnp.logical_or(arc_exists(brighter), arc_exists(darker))
    diff = jnp.abs(ring - center) - threshold
    score = jnp.sum(jnp.where(diff > 0, diff, 0.0), axis=0)
    # suppress the 3-pixel border where the ring wraps around
    H, W = image.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = ((ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3))
    return jnp.where(is_corner & interior, score, 0.0)


def harris_score(image, k=0.05, sigma=1.0):
    """Harris corner response via separable Gaussian-weighted moments."""
    from tadataka_tpu.core.gradients import sobel_x, sobel_y
    Ix = sobel_x(image, mode="reflect")
    Iy = sobel_y(image, mode="reflect")
    g = _gaussian_kernel(sigma)

    def smooth(x):
        x = jax.vmap(lambda row: jnp.convolve(row, g, mode="same"))(x)
        x = jax.vmap(lambda col: jnp.convolve(col, g, mode="same"))(x.T).T
        return x

    Sxx = smooth(Ix * Ix)
    Syy = smooth(Iy * Iy)
    Sxy = smooth(Ix * Iy)
    det = Sxx * Syy - Sxy * Sxy
    tr = Sxx + Syy
    return det - k * tr * tr


def _gaussian_kernel(sigma, radius=None):
    if radius is None:
        radius = int(3 * sigma + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def _nms3(score):
    """3x3 non-max suppression: keep strict local maxima."""
    neighborhood = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= neighborhood, score, 0.0)


def _topk_keypoints(score, k, subpixel_score=None):
    """Strongest-k grid positions, optionally refined to subpixel by a
    parabolic fit on ``subpixel_score`` (the pre-NMS response).

    Integer corner positions carry ~0.3 px quantization bias — enough to
    corrupt small-baseline essential-matrix estimation — so subpixel
    refinement is on for every detector here (cv2.FAST in the reference
    returns integer corners; this is an accuracy upgrade, not parity).
    """
    H, W = score.shape
    flat = score.ravel()
    vals, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(jnp.int32)
    xs = (idx % W).astype(jnp.int32)

    fx = xs.astype(jnp.float32)
    fy = ys.astype(jnp.float32)
    if subpixel_score is not None:
        s = subpixel_score

        def parabola_offset(sm, s0, sp):
            denom = sm - 2.0 * s0 + sp
            off = 0.5 * (sm - sp) / jnp.where(jnp.abs(denom) < 1e-12,
                                              1e-12, denom)
            return jnp.clip(off, -0.5, 0.5)

        xs0 = jnp.clip(xs, 1, W - 2)
        ys0 = jnp.clip(ys, 1, H - 2)
        dx = parabola_offset(s[ys0, xs0 - 1], s[ys0, xs0], s[ys0, xs0 + 1])
        dy = parabola_offset(s[ys0 - 1, xs0], s[ys0, xs0], s[ys0 + 1, xs0])
        fx = xs0.astype(jnp.float32) + dx
        fy = ys0.astype(jnp.float32) + dy

    keypoints = jnp.stack([fx, fy], axis=-1)
    mask = vals > 0.0
    return keypoints, mask


@partial(jax.jit, static_argnames=("max_keypoints",))
def detect_fast(image, threshold=50.0 / 255.0, max_keypoints=512):
    """FAST-9 corners, strongest ``max_keypoints`` after NMS, subpixel."""
    raw = fast_score(image, threshold)
    score = _nms3(raw)
    keypoints, mask = _topk_keypoints(score, max_keypoints,
                                      subpixel_score=raw)
    return Features(keypoints, jnp.zeros((max_keypoints, 0)), mask)


@partial(jax.jit, static_argnames=("max_keypoints",))
def detect_harris(image, max_keypoints=512, rel_threshold=1e-4):
    raw = harris_score(image)
    score = _nms3(raw)
    score = jnp.where(score > rel_threshold * jnp.max(score), score, 0.0)
    keypoints, mask = _topk_keypoints(score, max_keypoints,
                                      subpixel_score=raw)
    return Features(keypoints, jnp.zeros((max_keypoints, 0)), mask)
