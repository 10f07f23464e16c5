"""Pixel-grid coordinate helpers.

Parity surface: /root/reference/tadataka/coordinates.py (image_coordinates,
xy/yx swaps, gather/scatter get/substitute).
"""

import jax.numpy as jnp


def image_coordinates(image_shape, dtype=jnp.float32):
    """All pixel coordinates of an (H, W) image as (H*W, 2) in [x, y] order.

    Row-major over y then x, matching the reference
    (/root/reference/tadataka/coordinates.py:7-19).
    """
    H, W = image_shape[0], image_shape[1]
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    X, Y = jnp.meshgrid(xs, ys)
    return jnp.stack([X.ravel(), Y.ravel()], axis=-1)


def image_coordinate_grid(image_shape, dtype=jnp.float32):
    """(H, W, 2) grid of [x, y] coordinates."""
    H, W = image_shape[0], image_shape[1]
    return image_coordinates(image_shape, dtype).reshape(H, W, 2)


def xy_to_yx(coords):
    return coords[..., ::-1]


yx_to_xy = xy_to_yx


def get(image, us):
    """Gather image values at integer [x, y] coordinates."""
    us = us.astype(jnp.int32)
    return image[us[..., 1], us[..., 0]]


def substitute(image, us, values):
    """Scatter values into image at integer [x, y] coordinates."""
    us = us.astype(jnp.int32)
    return image.at[us[..., 1], us[..., 0]].set(values)
