"""Image curvature and curvature extrema (VITAMIN-E keypoints).

Parity surface: /root/reference/tadataka/flow_estimation/image_curvature.py —
kappa = fy^2 fxx - fx fy fxy - fy fx fyx + fx^2 fyy from reflect-mode Sobel
derivatives; extrema = pixels above the 95th (or 98th) percentile, emitted
here as a fixed-K top-k with mask instead of a dynamic np.where list.
"""

from functools import partial

import jax
import jax.numpy as jnp

from tadataka_tpu.core.gradients import grad_x, grad_y


def compute_curvature(fx, fy, fxx, fxy, fyx, fyy):
    f2x = fx * fx
    f2y = fy * fy
    return f2y * fxx - fx * fy * fxy - fy * fx * fyx + f2x * fyy


@jax.jit
def compute_image_curvature(image):
    gx = grad_x(image)
    gy = grad_y(image)
    gxx = grad_x(gx)
    gxy = grad_y(gx)
    gyx = grad_x(gy)
    gyy = grad_y(gy)
    return compute_curvature(gx, gy, gxx, gxy, gyx, gyy)


@partial(jax.jit, static_argnames=("max_keypoints",))
def extract_curvature_extrema(image, percentile=95.0, max_keypoints=1024):
    """Keypoints ([x, y]) where curvature exceeds the given percentile,
    strongest-first with a validity mask."""
    curvature = compute_image_curvature(image)
    threshold = jnp.percentile(curvature, percentile)
    H, W = curvature.shape
    flat = jnp.where(curvature > threshold, curvature, -jnp.inf).ravel()
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)
    keypoints = jnp.stack([xs, ys], axis=-1)
    mask = jnp.isfinite(vals)
    return keypoints, mask
