import numpy as np
import jax.numpy as jnp

from tadataka_tpu.features.orb import (corner_orientations, orb_descriptors,
                                       extract_orb_features)


def _textured_image(rng, h=96, w=96):
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    # smooth so gradients are meaningful
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(img, 2.0).astype(np.float32)


def test_orientation_points_along_gradient():
    """A half-dark/half-bright patch has its intensity centroid on the
    bright side: angle ~ 0 when the bright side is +x."""
    img = np.zeros((31, 31), np.float32)
    img[:, 16:] = 1.0
    kp = jnp.asarray([[15.0, 15.0]])
    theta = corner_orientations(jnp.asarray(img), kp)
    assert abs(float(theta[0])) < 0.05

    # bright side +y -> angle ~ pi/2
    theta2 = corner_orientations(jnp.asarray(img.T), kp)
    assert abs(float(theta2[0]) - np.pi / 2) < 0.05


def test_orb_rotation_invariance(rng):
    """Descriptors at the same physical point must survive a 90-degree
    image rotation (plain BRIEF would not)."""
    img = _textured_image(rng)
    h, w = img.shape
    kps = rng.uniform(25, 70, (30, 2)).astype(np.float32)

    # rotate image by 90 deg CCW: (x, y) -> (y, (w-1) - x)
    img_rot = np.rot90(img, k=-1).copy()
    kps_rot = np.stack([(h - 1) - kps[:, 1], kps[:, 0]], axis=-1)

    mask = jnp.ones(len(kps), dtype=bool)
    d0, v0, _ = orb_descriptors(jnp.asarray(img), jnp.asarray(kps), mask)
    d1, v1, _ = orb_descriptors(jnp.asarray(img_rot), jnp.asarray(kps_rot),
                                mask)
    agree = (np.asarray(d0) == np.asarray(d1)).mean(axis=1)
    valid = np.asarray(v0 & v1)
    # steered BRIEF keeps the large majority of bits stable under rotation
    assert valid.sum() >= 20
    assert agree[valid].mean() > 0.8


def test_extract_orb_features_shapes(rng):
    img = _textured_image(rng)
    feats = extract_orb_features(jnp.asarray(img), max_keypoints=128,
                                 threshold=0.02)
    assert feats.keypoints.shape == (128, 2)
    assert feats.descriptors.shape == (128, 256)
    assert set(np.unique(np.asarray(feats.descriptors))) <= {-1.0, 1.0}
