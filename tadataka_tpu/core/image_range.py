"""Float-inclusive image bounds tests.

Parity surface: /root/reference/src/image_range.rs:11 and
/root/reference/tadataka/utils.py (is_in_image_range):
0 <= x <= W-1 and 0 <= y <= H-1.
"""

import jax.numpy as jnp


def is_in_image_range(coordinates, image_shape):
    """coordinates (..., 2) in [x, y]; image_shape = (H, W[, ...])."""
    H, W = image_shape[0], image_shape[1]
    x = coordinates[..., 0]
    y = coordinates[..., 1]
    return ((0.0 <= x) & (x <= W - 1.0) & (0.0 <= y) & (y <= H - 1.0))


def all_in_image_range(coordinates, image_shape):
    return jnp.all(is_in_image_range(coordinates, image_shape), axis=-1)
