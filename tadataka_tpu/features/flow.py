"""Affine flow estimation between matched keypoint sets.

Parity surface:
/root/reference/tadataka/flow_estimation/flow_estimation.py:7-17 — per-axis
robust IRLS regression of the affine map.
"""

from typing import NamedTuple

import jax.numpy as jnp

from tadataka_tpu.core.transforms import to_homogeneous
from tadataka_tpu.robust.irls import irls_fit


class AffineTransform(NamedTuple):
    matrix: jnp.ndarray  # (3, 3)

    def __call__(self, points):
        p = to_homogeneous(points) @ self.matrix.T
        return p[..., :2]

    def inverse(self, points):
        Minv = jnp.linalg.inv(self.matrix)
        p = to_homogeneous(points) @ Minv.T
        return p[..., :2]


def estimate_affine_transform(keypoints0, keypoints1, mask=None):
    """Robust affine fit keypoints0 -> keypoints1 (masked rows zeroed)."""
    X = to_homogeneous(keypoints0)
    y0 = keypoints1[:, 0]
    y1 = keypoints1[:, 1]
    if mask is not None:
        w = mask.astype(X.dtype)[:, None]
        X = X * w
        y0 = y0 * mask
        y1 = y1 * mask
    params0 = irls_fit(X, y0)
    params1 = irls_fit(X, y1)
    M = jnp.eye(3, dtype=X.dtype).at[0].set(params0).at[1].set(params1)
    return AffineTransform(M)
