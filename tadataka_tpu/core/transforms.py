"""Rigid transforms, homogeneous coordinates, 4x4 motion matrices.

Parity surface: /root/reference/tadataka/matrix.py (motion_matrix, inverse,
relative transform, homogeneous), /root/reference/tadataka/rigid_transform.py
(batched einsum transforms), /root/reference/src/transform.rs and
/root/reference/src/homogeneous.rs.  All natively batched over leading dims.
"""

import jax.numpy as jnp


def to_homogeneous(X):
    """(..., d) -> (..., d+1) appending ones."""
    ones = jnp.ones(X.shape[:-1] + (1,), dtype=X.dtype)
    return jnp.concatenate([X, ones], axis=-1)


def from_homogeneous(X):
    """(..., d+1) -> (..., d), dropping the last component (no division)."""
    return X[..., :-1]


def motion_matrix(R, t):
    """R (..., 3, 3), t (..., 3) -> T (..., 4, 4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def get_rotation(T):
    return T[..., :3, :3]


def get_translation(T):
    return T[..., :3, 3]


def inv_motion_matrix(T):
    """Closed-form SE(3) inverse: [R^T, -R^T t]."""
    R = get_rotation(T)
    t = get_translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return motion_matrix(Rt, -(Rt @ t[..., None])[..., 0])


def relative_transform(T_wa, T_wb):
    """T_ab such that p_a = T_ab @ p_b, from world poses of frames a and b."""
    return inv_motion_matrix(T_wa) @ T_wb


def transform_points(T, P):
    """Apply 4x4 transform(s) to 3D points.

    T: (..., 4, 4), P: (..., N, 3) or (..., 3) -> same shape as P.
    """
    R = get_rotation(T)
    t = get_translation(T)
    if P.ndim >= 2 and P.shape[-2:] != (3,):
        # batched points: (..., N, 3) @ (..., 3, 3)^T + t
        return jnp.einsum('...ij,...nj->...ni', R, P) + t[..., None, :]
    return (R @ P[..., None])[..., 0] + t


def rotate_each(rotations, points):
    """Per-point rotations: rotations (N, 3, 3), points (N, 3) -> (N, 3)."""
    return jnp.einsum('nij,nj->ni', rotations, points)


def transform_each(rotations, translations, points):
    """Apply the i-th (R, t) to the i-th point (all shapes leading N)."""
    return rotate_each(rotations, points) + translations


def transform_all(rotations, translations, points):
    """All-pairs: (M poses) x (N points) -> (M, N, 3)."""
    return (jnp.einsum('mij,nj->mni', rotations, points)
            + translations[:, None, :])


def inv_transform_all(rotations, translations, points):
    """All-pairs inverse transform: R^T (p - t) -> (M, N, 3)."""
    diff = points[None, :, :] - translations[:, None, :]
    return jnp.einsum('mji,mnj->mni', rotations, diff)
