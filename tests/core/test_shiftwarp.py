"""Tent shift-sum warps vs direct bilinear sampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from tadataka_tpu.core.interpolation import interpolate
from tadataka_tpu.core.shiftwarp import (
    shift_warp_cols, shift_warp_rows, rot_warp, const_shift_cols)


def _smooth_image(H, W, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((H // 8, W // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)
           + np.roll(img, -1, 0) + np.roll(img, -1, 1)) / 5.0
    return jnp.asarray(img)


def test_shift_warp_cols_matches_bilinear():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((32, 128)), jnp.float32)
    x = jnp.asarray(
        np.arange(128)[None, :] + rng.uniform(-6, 6, (32, 128)), jnp.float32)
    out, ok = shift_warp_cols(img, x, max_shift=8)
    y = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32)[:, None],
                         (32, 128))
    expect = interpolate(img, jnp.stack([jnp.clip(x, 0, 127), y], axis=-1))
    assert bool(np.asarray(ok).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=1e-5)


def test_shift_warp_rows_matches_bilinear():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((32, 128)), jnp.float32)
    yq = jnp.asarray(
        np.arange(32)[:, None] + rng.uniform(-6, 6, (32, 128)), jnp.float32)
    out, ok = shift_warp_rows(img, yq, max_shift=8)
    x = jnp.broadcast_to(jnp.arange(128, dtype=jnp.float32), (32, 128))
    expect = interpolate(img, jnp.stack([x, jnp.clip(yq, 0, 31)], axis=-1))
    assert bool(np.asarray(ok).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=1e-5)


def test_shift_warp_budget_flagged():
    img = jnp.asarray(np.random.default_rng(3).random((16, 128)), jnp.float32)
    x = jnp.full((16, 128), 60.0, jnp.float32)   # |disp| up to ~60
    _, ok = shift_warp_cols(img, x, max_shift=8)
    ok = np.asarray(ok)
    assert not ok.all() and ok.any()
    # exactly the lanes within 8 px of column 60 are in budget
    cols = np.arange(128)
    np.testing.assert_array_equal(ok[0], np.abs(60.0 - cols) <= 8)


def test_shift_warp_channels_broadcast():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((3, 16, 128)), jnp.float32)
    x = jnp.asarray(np.arange(128)[None, :]
                    + rng.uniform(-3, 3, (16, 128)), jnp.float32)
    out, _ = shift_warp_cols(img, x, max_shift=4)
    for c in range(3):
        ref, _ = shift_warp_cols(img[c], x, max_shift=4)
        np.testing.assert_allclose(np.asarray(out[c]), np.asarray(ref),
                                   atol=1e-6)


@pytest.mark.parametrize("H33", [
    np.eye(3, dtype=np.float32),
    np.array([[1, 0, 3.7], [0, 1, -2.2], [0, 0, 1]], np.float32),
    np.array([[0.999, -0.012, 4.1],
              [0.011, 1.002, -1.7],
              [1.2e-5, -0.8e-5, 1.0]], np.float32),
])
def test_rot_warp_matches_gather_warp(H33):
    from tadataka_tpu.core.warp2pass import homography_warp
    img = _smooth_image(64, 128, seed=5)
    H33 = jnp.asarray(H33)
    out_t, valid_t = rot_warp(img, H33, 12, 12)
    out_g, valid_g = homography_warp(img, H33)
    both = np.asarray(valid_t) & np.asarray(valid_g)
    assert both.mean() > 0.8
    np.testing.assert_allclose(np.asarray(out_t)[both],
                               np.asarray(out_g)[both], atol=1e-4)


def test_rot_warp_budget_exceeded_invalid():
    img = _smooth_image(32, 128, seed=6)
    big_shift = jnp.asarray(
        np.array([[1, 0, 40.0], [0, 1, 0], [0, 0, 1]], np.float32))
    out, valid = rot_warp(img, big_shift, 8, 8)
    assert not bool(np.asarray(valid).any())


def test_const_shift_cols_fractional():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((8, 128)), jnp.float32)
    out = const_shift_cols(img, jnp.float32(5.25), fill=-1.0)
    expect = (0.75 * np.asarray(img)[:, 5:127]
              + 0.25 * np.asarray(img)[:, 6:128])
    np.testing.assert_allclose(np.asarray(out)[:, :122], expect,
                               atol=1e-5)
    # shifted-past-the-edge positions hold the fill
    assert np.all(np.asarray(out)[:, 123:] == -1.0)


def test_const_shift_cols_negative():
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((8, 64)), jnp.float32)
    out = const_shift_cols(img, jnp.float32(-3.0), fill=-1.0)
    np.testing.assert_allclose(np.asarray(out)[:, 3:], np.asarray(img)[:, :61],
                               atol=1e-6)
    assert np.all(np.asarray(out)[:, :3] == -1.0)


def test_tent_sample_matches_bilinear_constant_x_rows():
    """Constant-in-y column map: the two-pass composition is exact."""
    from tadataka_tpu.core.shiftwarp import tent_sample
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.random((48, 96)), jnp.float32)
    xs = np.arange(96)[None, :] + rng.uniform(-5, 5, (1, 96))
    x_map = jnp.asarray(np.broadcast_to(xs, (48, 96)), jnp.float32)
    y_map = jnp.asarray(np.arange(48)[:, None]
                        + rng.uniform(-5, 5, (48, 96)), jnp.float32)
    out, ok = tent_sample(img, x_map, y_map, 8, 8)
    coords = jnp.stack([jnp.clip(x_map, 0, 95), jnp.clip(y_map, 0, 47)],
                       axis=-1)
    expect = interpolate(img, coords)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5)


def test_tent_sample_smooth_field_close_to_bilinear():
    """Smooth 2-D flow field: two-pass deviation stays tiny."""
    from tadataka_tpu.core.shiftwarp import tent_sample
    img = _smooth_image(64, 128, seed=10)
    ys, xs = np.meshgrid(np.arange(64.0), np.arange(128.0), indexing="ij")
    x_map = jnp.asarray(xs + 3.0 * np.sin(ys / 19.0), jnp.float32)
    y_map = jnp.asarray(ys + 2.0 * np.cos(xs / 23.0), jnp.float32)
    out, ok = tent_sample(img, x_map, y_map, 6, 6)
    coords = jnp.stack([jnp.clip(x_map, 0, 127), jnp.clip(y_map, 0, 63)],
                       axis=-1)
    expect = interpolate(img, coords)
    err = np.abs(np.asarray(out) - np.asarray(expect))[np.asarray(ok)]
    # deviation is O(|y_map - y| * d(x_map)/dy * image gradient): subpixel
    # sample-position error, tiny on average, bounded at block edges
    assert err.mean() < 1e-2
    assert err.max() < 0.2


def test_tent_sample_budget_and_channels():
    from tadataka_tpu.core.shiftwarp import tent_sample
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((3, 32, 64)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(32.0), np.arange(64.0), indexing="ij")
    x_map = jnp.asarray(xs + 20.0, jnp.float32)     # over the 8-px budget
    y_map = jnp.asarray(ys, jnp.float32)
    out, ok = tent_sample(img, x_map, y_map, 8, 8)
    assert out.shape == (3, 32, 64)
    assert not bool(np.asarray(ok)[:, :40].any())
