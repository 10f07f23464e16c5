"""Image gradients: Sobel, central differences, 1-D forward differences.

Parity surface: /root/reference/src/gradient.rs (zero-padded Sobel used by the
semi-dense pipeline), /root/reference/tadataka/gradient.py (scipy reflect-mode
Sobel used by curvature), and np.gradient as used by DVO
(/root/reference/tadataka/vo/dvo/jacobian.py:27).

All are expressed as XLA convolutions / shifts — no im2col loops.
"""

import jax.numpy as jnp
from jax import lax

# Positive-x / positive-y Sobel kernels (correlation convention).
_SOBEL_X = jnp.array([[-1., 0., 1.],
                      [-2., 0., 2.],
                      [-1., 0., 1.]])
_SOBEL_Y = jnp.array([[-1., -2., -1.],
                      [0., 0., 0.],
                      [1., 2., 1.]])


def _correlate2d(image, kernel, padding):
    img = image[None, None, :, :].astype(kernel.dtype)
    ker = kernel[None, None, :, :]
    out = lax.conv_general_dilated(
        img, ker, window_strides=(1, 1), padding=padding,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return out[0, 0]


def sobel_x(image, mode="zero"):
    """d/dx Sobel (smoothed, unnormalized — 4x the central difference).

    mode="zero": zero border like the Rust kernels (src/gradient.rs:4-26,
    sign-flipped to the standard positive-x convention);
    mode="reflect": scipy-compatible borders (tadataka/gradient.py:4).
    """
    return _apply_sobel(image, _SOBEL_X, mode)


def sobel_y(image, mode="zero"):
    return _apply_sobel(image, _SOBEL_Y, mode)


def _apply_sobel(image, kernel, mode):
    if mode == "zero":
        out = _correlate2d(image, kernel, padding="VALID")
        return jnp.pad(out, 1)
    if mode == "reflect":
        # scipy.ndimage's "reflect" repeats the edge sample — numpy/jnp call
        # that "symmetric"
        padded = jnp.pad(image, 1, mode="symmetric")
        return _correlate2d(padded, kernel, padding="VALID")
    raise ValueError(f"unknown border mode {mode!r}")


def grad_x(image):
    """scipy.ndimage.sobel(axis=1, mode='reflect') equivalent."""
    return sobel_x(image, mode="reflect")


def grad_y(image):
    return sobel_y(image, mode="reflect")


def np_gradient_2d(image):
    """np.gradient for 2-D arrays: central differences, one-sided edges.

    Returns (DX, DY) in the DVO convention (x-derivative first), matching
    calc_image_gradient (/root/reference/tadataka/vo/dvo/jacobian.py:27-29).
    """
    DY = _central_diff(image, axis=0)
    DX = _central_diff(image, axis=1)
    return DX, DY


def _central_diff(a, axis):
    upper = jnp.roll(a, -1, axis=axis)
    lower = jnp.roll(a, 1, axis=axis)
    interior = (upper - lower) / 2.0
    # one-sided at the borders
    first = jnp.take(a, jnp.array([1]), axis=axis) - \
        jnp.take(a, jnp.array([0]), axis=axis)
    last = jnp.take(a, jnp.array([a.shape[axis] - 1]), axis=axis) - \
        jnp.take(a, jnp.array([a.shape[axis] - 2]), axis=axis)
    out = interior
    idx_first = [slice(None)] * a.ndim
    idx_first[axis] = slice(0, 1)
    idx_last = [slice(None)] * a.ndim
    idx_last[axis] = slice(a.shape[axis] - 1, a.shape[axis])
    out = out.at[tuple(idx_first)].set(first)
    out = out.at[tuple(idx_last)].set(last)
    return out


def gradient1d(x):
    """Forward differences along the last axis: out[i] = x[i+1] - x[i].

    Parity: /root/reference/src/gradient.rs:28-35.  Output length n-1.
    """
    return x[..., 1:] - x[..., :-1]
