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


def estimate_homography(kp1, kp2, mask):
    """Masked DLT homography (invalid rows weighted to zero)."""
    w = mask.astype(kp1.dtype)
    x1, y1 = kp1[:, 0], kp1[:, 1]
    x2, y2 = kp2[:, 0], kp2[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    rows_a = jnp.stack([x1, y1, one, zero, zero, zero,
                        -x2 * x1, -x2 * y1, -x2], axis=-1)
    rows_b = jnp.stack([zero, zero, zero, x1, y1, one,
                        -y2 * x1, -y2 * y1, -y2], axis=-1)
    A = jnp.concatenate([rows_a * w[:, None], rows_b * w[:, None]], axis=0)
    h = solve_nullspace(A)
    H = h.reshape(3, 3)
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
