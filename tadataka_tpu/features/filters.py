"""Match validation: homography DLT + chi-squared symmetric-transfer test.

Parity surface: /root/reference/tadataka/cost.py (symmetric transfer
residuals under a homography) and /root/reference/tadataka/stat.py (ZCA
whitening + chi^2 gate, p=0.95, dof=2).
"""

import jax.numpy as jnp

from tadataka_tpu.core.solvers import solve_nullspace
from tadataka_tpu.core.transforms import to_homogeneous

# chi2.ppf(0.95, dof=2) — host constant, no scipy at trace time
CHI2_95_DOF2 = 5.991464547107979
EPSILON = 1e-10


def _masked_normalization(points, mask):
    """Hartley normalization transform from the masked point set."""
    w = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(points * w[:, None], axis=0) / n
    centered = points - mean
    dist = jnp.linalg.norm(centered, axis=1) * w
    scale = jnp.sqrt(2.0) / (jnp.sum(dist) / n + EPSILON)
    T = jnp.array([[scale, 0.0, -scale * mean[0]],
                   [0.0, scale, -scale * mean[1]],
                   [0.0, 0.0, 1.0]], dtype=points.dtype)
    return (centered * scale), T


def estimate_homography(kp1, kp2, mask):
    """Masked, Hartley-normalized DLT homography (invalid rows zeroed)."""
    w = mask.astype(kp1.dtype)
    p1, T1 = _masked_normalization(kp1, mask)
    p2, T2 = _masked_normalization(kp2, mask)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    rows_a = jnp.stack([x1, y1, one, zero, zero, zero,
                        -x2 * x1, -x2 * y1, -x2], axis=-1)
    rows_b = jnp.stack([zero, zero, zero, x1, y1, one,
                        -y2 * x1, -y2 * y1, -y2], axis=-1)
    A = jnp.concatenate([rows_a * w[:, None], rows_b * w[:, None]], axis=0)
    h = solve_nullspace(A)
    H = jnp.linalg.inv(T2) @ h.reshape(3, 3) @ T1
    return H / (H[2, 2] + EPSILON)


def _apply_homography(H, points):
    p = to_homogeneous(points) @ H.T
    return p[:, :2] / (p[:, 2:3] + EPSILON)


def _zca_whiten(X, mask):
    """Masked mean-centering + ZCA whitening of 2-D residuals."""
    w = mask.astype(X.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(X * w[:, None], axis=0) / n
    Xc = (X - mean) * w[:, None]
    C = (Xc.T @ Xc) / jnp.maximum(n - 1.0, 1.0)
    U, s, _ = jnp.linalg.svd(C)
    S = jnp.diag(1.0 / (jnp.sqrt(s) + EPSILON))
    ZCA = U @ S @ U.T
    return (X - mean) @ ZCA.T


def chi_squared_test(X, mask, threshold=CHI2_95_DOF2):
    Y = _zca_whiten(X, mask)
    E = jnp.sum(Y * Y, axis=-1)
    return E <= threshold


def symmetric_transfer_filter(kp1, kp2, mask, p=0.95):
    """Inlier mask from symmetric transfer error under a fitted homography."""
    del p  # threshold precomputed for p=0.95, dof=2
    H = estimate_homography(kp1, kp2, mask)
    Hinv = jnp.linalg.inv(H)
    D12 = _apply_homography(H, kp1) - kp2
    D21 = kp1 - _apply_homography(Hinv, kp2)
    return (chi_squared_test(D12, mask)
            & chi_squared_test(D21, mask) & mask)
