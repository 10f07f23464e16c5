"""Precomputed undistortion lookup table.

Parity surface: /root/reference/tadataka/camera/table.py
(``NoramlizationMapTable`` [sic] — name fixed here): normalize the full pixel
grid once, then answer arbitrary queries by bilinear lookup.  Useful when the
iterative RadTan undistort would otherwise run per frame.
"""

import jax.numpy as jnp

from tadataka_tpu.core.coordinates import image_coordinates
from tadataka_tpu.core.interpolation import interpolate
from tadataka_tpu.core.image_range import is_in_image_range


class NormalizationMapTable:
    def __init__(self, camera_model, image_shape):
        self.image_shape = tuple(image_shape)
        us = image_coordinates(image_shape)
        xs = camera_model.normalize(us)
        H, W = self.image_shape
        self._x_map = xs[:, 0].reshape(H, W)
        self._y_map = xs[:, 1].reshape(H, W)

    def normalize(self, us):
        """us (..., 2) pixel coords (must lie in the image)."""
        x = interpolate(self._x_map, us)
        y = interpolate(self._y_map, us)
        return jnp.stack([x, y], axis=-1)

    def in_range(self, us):
        return is_in_image_range(us, self.image_shape)
