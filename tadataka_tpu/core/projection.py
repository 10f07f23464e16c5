"""Pinhole projection pi and back-projection pi^-1.

Parity surface: /root/reference/src/projection.rs:11-16 (x/(z+eps) with the
same epsilon guard) and /root/reference/tadataka/projection.py.  Natively
batched over leading dims.
"""

import jax.numpy as jnp

EPSILON = 1e-16


def pi(P):
    """Project 3D point(s) (..., 3) -> normalized image coords (..., 2).

    x = [X/Z, Y/Z] with a z + eps guard matching the reference.
    """
    z = P[..., 2:3]
    return P[..., :2] / (z + EPSILON)


def inv_pi(x, depth):
    """Back-project normalized coords (..., 2) at depth (...,) -> (..., 3)."""
    return jnp.concatenate(
        [x * depth[..., None], depth[..., None]], axis=-1)
