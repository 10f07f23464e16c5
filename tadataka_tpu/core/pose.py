"""Pose: SE(3) element as a JAX pytree.

Parity surface: /root/reference/tadataka/pose.py:19-64 (Pose with scipy
Rotation).  Here rotation is stored as a raw 3x3 matrix so a Pose (or a stack
of Poses) flows through jit/vmap/grad and device placement like any array.
Composition semantics match the reference: (a * b).R = a.R @ b.R,
(a * b).t = a.R @ b.t + a.t.
"""

from typing import NamedTuple

import jax.numpy as jnp

from tadataka_tpu.core.so3 import exp_so3, log_so3
from tadataka_tpu.core.se3 import exp_se3_t, log_se3
from tadataka_tpu.core.transforms import motion_matrix


class Pose(NamedTuple):
    """SE(3) pose; supports leading batch dims on both fields."""
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    @property
    def T(self):
        """4x4 motion matrix."""
        return motion_matrix(self.R, self.t)

    @property
    def rotvec(self):
        return log_so3(self.R)

    @classmethod
    def identity(cls, batch=(), dtype=jnp.float32):
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
        t = jnp.zeros(batch + (3,), dtype=dtype)
        return cls(R, t)

    @classmethod
    def from_rotvec(cls, rotvec, t):
        return cls(exp_so3(rotvec), jnp.asarray(t))

    @classmethod
    def from_se3(cls, xi):
        """xi = [v, omega]; translation goes through V(omega) like the reference."""
        return cls(exp_so3(xi[..., 3:]), exp_se3_t(xi))

    @classmethod
    def from_matrix(cls, T):
        return cls(T[..., :3, :3], T[..., :3, 3])

    def se3(self):
        return log_se3(self.T)

    def inv(self):
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(Rt, -(Rt @ self.t[..., None])[..., 0])

    def __mul__(self, other):
        return Pose(self.R @ other.R,
                    (self.R @ other.t[..., None])[..., 0] + self.t)

    def apply(self, P):
        """Transform 3D points (..., 3) or (N, 3)."""
        from tadataka_tpu.core.transforms import transform_points
        return transform_points(self.T, P)

    def isclose(self, other, atol=1e-5):
        return jnp.logical_and(
            jnp.allclose(self.R, other.R, atol=atol),
            jnp.allclose(self.t, other.t, atol=atol))
