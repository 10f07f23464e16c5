"""SE(3) exponential / logarithm.

Parity surface: /root/reference/tadataka/se3.py:15-64 (closed-form exp with
small-theta Taylor V, log via V^-1).  xi ordering follows the reference:
xi = [v, omega] with v the translational part (xi[:3]) and omega the rotation
vector (xi[3:]).
"""

import jax.numpy as jnp

from tadataka_tpu.core.so3 import hat_so3, exp_so3, log_so3, _theta_terms


def _V(rotvec):
    """Left Jacobian V(omega) with Taylor guards, (..., 3) -> (..., 3, 3)."""
    small, sq, safe = _theta_terms(rotvec)
    small, sq, safe = (x[..., None, None] for x in (small, sq, safe))
    K = hat_so3(rotvec)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    # (1-cos t)/t^2 and (t - sin t)/t^3, double-where for grad safety
    b = jnp.where(small, 0.5 - sq / 24.0,
                  (1.0 - jnp.cos(safe)) / (safe * safe))
    c = jnp.where(small, 1.0 / 6.0 - sq / 120.0,
                  (safe - jnp.sin(safe)) / (safe ** 3))
    return eye + b * K + c * KK


def _V_inv(rotvec):
    """Inverse left Jacobian, closed form with Taylor guard."""
    small, sq, safe = _theta_terms(rotvec)
    small, sq, safe = (x[..., None, None] for x in (small, sq, safe))
    K = hat_so3(rotvec)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    # beta = (1 - t*sin(t) / (2*(1-cos t))) / t^2 ; Taylor: 1/12 + t^2/720
    denom = jnp.where(small, 1.0, 2.0 * (1.0 - jnp.cos(safe)))
    beta = jnp.where(small, 1.0 / 12.0 + sq / 720.0,
                     (1.0 - safe * jnp.sin(safe) / denom) / (safe * safe))
    return eye - 0.5 * K + beta * KK


def exp_se3_t(xi):
    """Translation component of exp(xi^): V(omega) @ v, xi (..., 6) -> (..., 3)."""
    v, rotvec = xi[..., :3], xi[..., 3:]
    return (_V(rotvec) @ v[..., None])[..., 0]


def exp_se3(xi):
    """xi (..., 6) -> 4x4 motion matrix (..., 4, 4)."""
    rotvec = xi[..., 3:]
    R = exp_so3(rotvec)
    t = exp_se3_t(xi)
    return _assemble(R, t)


def log_se3(G):
    """4x4 motion matrix (..., 4, 4) -> xi (..., 6) = [v, omega]."""
    R = G[..., :3, :3]
    t = G[..., :3, 3]
    rotvec = log_so3(R)
    v = (_V_inv(rotvec) @ t[..., None])[..., 0]
    return jnp.concatenate([v, rotvec], axis=-1)


def _assemble(R, t):
    batch = R.shape[:-2]
    G = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    G = G.at[..., :3, :3].set(R)
    G = G.at[..., :3, 3].set(t)
    G = G.at[..., 3, 3].set(1.0)
    return G
