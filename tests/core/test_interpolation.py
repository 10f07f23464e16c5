import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose
from scipy import ndimage

from tadataka_tpu.core.interpolation import interpolate, interpolate_checked


def test_interpolate_manual():
    image = jnp.array([[0., 1., 5.],
                       [0., 0., 2.],
                       [4., 3., 2.],
                       [5., 6., 1.]])
    c = jnp.array([1.3, 2.6])
    expected = (image[2, 1] * (2.0 - 1.3) * (3.0 - 2.6)
                + image[2, 2] * (1.3 - 1.0) * (3.0 - 2.6)
                + image[3, 1] * (2.0 - 1.3) * (2.6 - 2.0)
                + image[3, 2] * (1.3 - 1.0) * (2.6 - 2.0))
    assert_allclose(interpolate(image, c), expected, rtol=1e-6)

    # exact integer coordinates
    assert_allclose(interpolate(image, jnp.array([0.0, 0.0])), image[0, 0])
    assert_allclose(interpolate(image, jnp.array([2.0, 3.0])), image[3, 2])

    # boundary: x at max column
    c = jnp.array([2.0, 2.5])
    expected = image[2, 2] * 0.5 + image[3, 2] * 0.5
    assert_allclose(interpolate(image, c), expected, rtol=1e-6)


def test_interpolate_matches_map_coordinates(rng):
    image = jnp.asarray(rng.uniform(0, 1, (20, 30)).astype(np.float32))
    coords = rng.uniform(0, 18, (50, 2)).astype(np.float32)  # [x, y]
    out = interpolate(image, jnp.asarray(coords))
    expected = ndimage.map_coordinates(
        np.asarray(image), [coords[:, 1], coords[:, 0]], order=1)
    assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_interpolate_batched_shape(rng):
    image = jnp.asarray(rng.uniform(0, 1, (8, 8)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 7, (4, 5, 2)).astype(np.float32))
    assert interpolate(image, coords).shape == (4, 5)


def test_interpolate_checked_masks_out_of_range():
    image = jnp.ones((4, 4))
    coords = jnp.array([[1.0, 1.0], [5.0, 1.0], [-1.0, 0.0]])
    values, mask = interpolate_checked(image, coords, fill=-7.0)
    assert list(np.asarray(mask)) == [True, False, False]
    assert_allclose(values, [1.0, -7.0, -7.0])
