import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose
from scipy import ndimage

from tadataka_tpu.core.gradients import (
    sobel_x, sobel_y, grad_x, grad_y, np_gradient_2d, gradient1d)


MAP = np.array([[1., 2., -1., 0.],
                [0., 0., -1., 1.],
                [3., -2., 0., -1.],
                [-2., 1., 1., 2.]], dtype=np.float32)


def test_sobel_zero_border_matches_reference_magnitudes():
    # the reference Rust sobel uses the negated kernel; ours is the standard
    # positive-x convention, so values match up to sign
    # (src/gradient.rs test fixture)
    expected_ref_x = np.array([[0., 0., 0., 0.],
                               [0., 7., -1., 0.],
                               [0., 4., -4., 0.],
                               [0., 0., 0., 0.]])
    assert_allclose(sobel_x(jnp.asarray(MAP), mode="zero"), -expected_ref_x)

    expected_ref_y = np.array([[0., 0., 0., 0.],
                               [0., 5., 3., 0.],
                               [0., -2., -6., 0.],
                               [0., 0., 0., 0.]])
    assert_allclose(sobel_y(jnp.asarray(MAP), mode="zero"), -expected_ref_y)


def test_reflect_sobel_matches_scipy(rng):
    image = rng.uniform(0, 1, (12, 15)).astype(np.float32)
    assert_allclose(grad_x(jnp.asarray(image)),
                    ndimage.sobel(image, axis=1, mode="reflect"),
                    rtol=1e-4, atol=1e-5)
    assert_allclose(grad_y(jnp.asarray(image)),
                    ndimage.sobel(image, axis=0, mode="reflect"),
                    rtol=1e-4, atol=1e-5)


def test_np_gradient_matches_numpy(rng):
    image = rng.uniform(0, 1, (10, 13)).astype(np.float32)
    DY_np, DX_np = np.gradient(image)
    DX, DY = np_gradient_2d(jnp.asarray(image))
    assert_allclose(DX, DX_np, rtol=1e-4, atol=1e-6)
    assert_allclose(DY, DY_np, rtol=1e-4, atol=1e-6)


def test_gradient1d():
    x = jnp.array([-1., 1., 0., 3., -2.])
    assert_allclose(gradient1d(x), [2., -1., 3., -5.])
