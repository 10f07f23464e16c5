"""Two-pass warps vs direct scattered bilinear sampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from tadataka_tpu.core.interpolation import interpolate
from tadataka_tpu.core.warp2pass import (
    gather_rows_bilinear, gather_cols_bilinear, homography_warp,
    displacement_warp)


def _smooth_image(H, W, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((H // 8, W // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    # light smoothing so bilinear reconstruction differences stay small
    img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
           + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    return jnp.asarray(img)


def test_gather_rows_matches_direct():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((32, 128)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 31, (32, 128)), jnp.float32)
    out = gather_rows_bilinear(img, y)
    x = jnp.broadcast_to(jnp.arange(128, dtype=jnp.float32), (32, 128))
    expect = interpolate(img, jnp.stack([x, y], axis=-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=1e-5)


def test_gather_cols_matches_direct():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((32, 128)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 127, (32, 128)), jnp.float32)
    out = gather_cols_bilinear(img, x)
    y = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32)[:, None],
                         (32, 128))
    expect = interpolate(img, jnp.stack([x, y], axis=-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("H33", [
    # identity
    np.eye(3, dtype=np.float32),
    # pure translation
    np.array([[1, 0, 3.7], [0, 1, -2.2], [0, 0, 1]], np.float32),
    # small VO-like homography: slight rotation + parallax + perspective
    np.array([[0.999, -0.012, 4.1],
              [0.011, 1.002, -1.7],
              [1.2e-5, -0.8e-5, 1.0]], np.float32),
])
def test_homography_warp_matches_direct(H33):
    img = _smooth_image(64, 128, seed=3)
    H33 = jnp.asarray(H33)
    out, valid = homography_warp(img, H33)

    Ho, Wo = img.shape
    x = jnp.broadcast_to(jnp.arange(Wo, dtype=jnp.float32), (Ho, Wo))
    y = jnp.broadcast_to(jnp.arange(Ho, dtype=jnp.float32)[:, None],
                         (Ho, Wo))
    D = H33[2, 0] * x + H33[2, 1] * y + H33[2, 2]
    U = (H33[0, 0] * x + H33[0, 1] * y + H33[0, 2]) / D
    V = (H33[1, 0] * x + H33[1, 1] * y + H33[1, 2]) / D
    direct = interpolate(img, jnp.stack([U, V], axis=-1))

    v = np.asarray(valid)
    assert v.mean() > 0.8
    err = np.abs(np.asarray(out) - np.asarray(direct))[v]
    # separable resampling differs from direct bilinear only in the
    # reconstruction cross-term; on a smooth image it stays tiny
    assert np.median(err) < 2e-3
    assert err.max() < 0.05


def test_homography_warp_identity_exact():
    img = _smooth_image(32, 128, seed=4)
    out, valid = homography_warp(img, jnp.eye(3, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert bool(np.asarray(valid).all())


def test_homography_warp_validity_marks_out_of_image():
    img = _smooth_image(32, 128, seed=5)
    shift = jnp.asarray(np.array([[1, 0, 1000.0], [0, 1, 0], [0, 0, 1]],
                                 np.float32))
    out, valid = homography_warp(img, shift, fill=-1.0)
    assert not bool(np.asarray(valid).any())
    assert float(np.asarray(out).max()) == -1.0


def test_displacement_warp_small_field():
    img = _smooth_image(64, 128, seed=6)
    rng = np.random.default_rng(7)
    # smooth small displacement field
    base = rng.random((8, 16)).astype(np.float32) * 4.0 - 2.0
    dx = jnp.asarray(np.kron(base, np.ones((8, 8), np.float32)))
    base2 = rng.random((8, 16)).astype(np.float32) * 4.0 - 2.0
    dy = jnp.asarray(np.kron(base2, np.ones((8, 8), np.float32)))

    out, valid = displacement_warp(img, dx, dy)
    Ho, Wo = img.shape
    x = jnp.broadcast_to(jnp.arange(Wo, dtype=jnp.float32), (Ho, Wo))
    y = jnp.broadcast_to(jnp.arange(Ho, dtype=jnp.float32)[:, None],
                         (Ho, Wo))
    direct = interpolate(img, jnp.stack([x + dx, y + dy], axis=-1))
    v = np.asarray(valid)
    err = np.abs(np.asarray(out) - np.asarray(direct))[v]
    assert np.median(err) < 5e-3
