"""Evaluation metrics: photometric error, Umeyama alignment, ATE/RPE.

Parity surface: /root/reference/tadataka/metric.py (masked-mean photometric
error) and /root/reference/tadataka/rigid_motion.py (LeastSquaresRigidMotion
— the sim(3) Umeyama alignment used as the de-facto ATE tool in the
reference examples).
"""

import jax.numpy as jnp

from tadataka_tpu.core.coordinates import image_coordinates
from tadataka_tpu.core.interpolation import interpolate
from tadataka_tpu.core.image_range import is_in_image_range
from tadataka_tpu.core.warp import warp2d


def photometric_error(T10, camera_model0, camera_model1, I0, D0, I1):
    """Masked mean squared intensity difference after warping all pixels.

    Parity: photometric_error (/root/reference/tadataka/metric.py:13-27),
    with boolean compaction replaced by a masked mean.
    """
    us0 = image_coordinates(D0.shape, dtype=I0.dtype)
    us1, depths1 = warp2d(T10, camera_model0, camera_model1,
                          us0, D0.ravel())
    mask = is_in_image_range(us1, D0.shape)
    i0 = I0.ravel()
    i1 = interpolate(I1, us1)
    d = jnp.where(mask, i0 - i1, 0.0)
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(d * d) / n


class PhotometricError:
    """Closure form matching the reference API (metric.py:30-39)."""

    def __init__(self, camera_model0, camera_model1, I0, D0, I1):
        self.camera_model0 = camera_model0
        self.camera_model1 = camera_model1
        self.I0, self.D0, self.I1 = I0, D0, I1

    def __call__(self, pose10):
        return photometric_error(pose10.T, self.camera_model0,
                                 self.camera_model1, self.I0, self.D0, self.I1)


def umeyama_alignment(P, Q):
    """Least-squares sim(3): find (s, R, t) minimizing ||s R p + t - q||^2.

    Parity: LeastSquaresRigidMotion (/root/reference/tadataka/rigid_motion.py:42).
    P, Q: (N, 3).  Returns (R, t, s).
    """
    mean_p = jnp.mean(P, axis=0)
    mean_q = jnp.mean(Q, axis=0)
    X = P - mean_p
    Y = Q - mean_q

    S = X.T @ Y
    U, _, VT = jnp.linalg.svd(S)
    V = VT.T
    # proper rotation: flip the last column if det < 0
    d = jnp.sign(jnp.linalg.det(V @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d))
    R = V @ D @ U.T

    s = jnp.sum((Y @ R) * X) / jnp.sum(X * X)
    t = mean_q - s * (R @ mean_p)
    return R, t, s


def apply_similarity(R, t, s, P):
    return s * (P @ R.T) + t


def absolute_trajectory_error(estimated, ground_truth, align=True):
    """RMS position error after optional Umeyama alignment.

    estimated, ground_truth: (N, 3) camera positions.
    """
    if align:
        R, t, s = umeyama_alignment(estimated, ground_truth)
        estimated = apply_similarity(R, t, s, estimated)
    d = estimated - ground_truth
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))


def relative_pose_error(estimated, ground_truth, delta=1):
    """RMS relative translation error over pose pairs ``delta`` apart."""
    est_rel = estimated[delta:] - estimated[:-delta]
    gt_rel = ground_truth[delta:] - ground_truth[:-delta]
    d = est_rel - gt_rel
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))
