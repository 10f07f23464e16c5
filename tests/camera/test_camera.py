import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from tadataka_tpu.camera import (
    CameraParameters, CameraModel, FOV, RadTan, NoDistortion, resize,
    NormalizationMapTable)
from tadataka_tpu.camera import io as camera_io


def test_normalize_unnormalize():
    params = CameraParameters.create((10., 20.), (2., 4.))
    unnormalized = jnp.array([[12., 24.], [0., 0.], [8., 10.]])
    normalized = jnp.array([[1.0, 1.0], [-0.2, -0.2], [0.6, 0.3]])
    assert_allclose(params.normalize(unnormalized), normalized, atol=1e-6)
    assert_allclose(params.unnormalize(normalized), unnormalized, atol=1e-5)
    # 1-D input
    assert_allclose(params.normalize(jnp.array([12., 24.])), [1.0, 1.0],
                    atol=1e-6)


def test_camera_matrix():
    params = CameraParameters.create((1.0, 1.2), (0.8, 0.2))
    assert_allclose(params.matrix,
                    [[1.0, 0.0, 0.8], [0.0, 1.2, 0.2], [0.0, 0.0, 1.0]])


def test_fov_roundtrip(rng):
    fov = FOV.create(0.92)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (20, 2)).astype(np.float32))
    assert_allclose(fov.undistort(fov.distort(x)), x, rtol=1e-3, atol=1e-5)


def test_fov_zero_radius():
    fov = FOV.create(0.92)
    x = jnp.array([[0.0, 0.0], [1e-12, 0.0]])
    out = fov.distort(x)
    assert np.all(np.isfinite(np.asarray(out)))
    assert_allclose(out[0], [0.0, 0.0], atol=1e-8)


def test_fov_zero_omega_identity(rng):
    fov = FOV.create(0.0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (5, 2)).astype(np.float32))
    assert_allclose(fov.distort(x), x, atol=1e-7)
    assert_allclose(fov.undistort(x), x, atol=1e-7)


def test_radtan_against_opencv_formula(rng):
    coeffs = np.array([0.1, -0.05, 0.01, -0.002, 0.003], dtype=np.float32)
    rt = RadTan.create(coeffs)
    x = rng.uniform(-0.4, 0.4, (10, 2)).astype(np.float32)
    k1, k2, p1, p2, k3 = coeffs
    u, v = x[:, 0], x[:, 1]
    r2 = u**2 + v**2
    kr = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    expected = np.stack([
        u * kr + 2 * p1 * u * v + p2 * (r2 + 2 * u**2),
        v * kr + 2 * p2 * u * v + p1 * (r2 + 2 * v**2)], axis=-1)
    assert_allclose(rt.distort(jnp.asarray(x)), expected, rtol=1e-4, atol=1e-6)


def test_radtan_undistort_roundtrip(rng):
    rt = RadTan.create([0.1, -0.05, 0.01, -0.002, 0.0])
    x = jnp.asarray(rng.uniform(-0.4, 0.4, (20, 2)).astype(np.float32))
    distorted = rt.distort(x)
    assert_allclose(rt.undistort(distorted), x, rtol=1e-3, atol=1e-5)


def test_camera_model_normalize_roundtrip(rng):
    cm = CameraModel.create(
        CameraParameters.create((100., 100.), (50., 40.)),
        FOV.create(0.9))
    us = jnp.asarray(rng.uniform(10, 80, (15, 2)).astype(np.float32))
    xs = cm.normalize(us)
    assert_allclose(cm.unnormalize(xs), us, rtol=1e-3, atol=1e-2)


def test_string_roundtrip():
    cm = CameraModel.create(
        CameraParameters.create((100., 110.), (50., 40.)),
        FOV.create(0.9))
    cm2 = CameraModel.fromstring(str(cm))
    assert_allclose(cm2.camera_parameters.focal_length, [100., 110.])
    assert_allclose(cm2.distortion_model.omega, 0.9, rtol=1e-6)

    cm = CameraModel.create(
        CameraParameters.create((10., 20.), (5., 4.)),
        RadTan.create([0.1, -0.05, 0.01, 0.0, 0.0]))
    cm2 = CameraModel.fromstring(str(cm))
    assert_allclose(cm2.distortion_model.dist_coeffs,
                    [0.1, -0.05, 0.01, 0.0, 0.0], atol=1e-7)


def test_io_roundtrip(tmp_path):
    models = {
        1: CameraModel.create(CameraParameters.create((10., 20.), (5., 4.)),
                              FOV.create(0.25)),
        0: CameraModel.create(CameraParameters.create((1., 2.), (3., 4.)),
                              NoDistortion()),
    }
    path = tmp_path / "cameras.txt"
    camera_io.save(path, models)
    loaded = camera_io.load(path)
    assert set(loaded.keys()) == {0, 1}
    assert_allclose(loaded[1].camera_parameters.offset, [5., 4.])


def test_resize():
    cm = CameraModel.create(CameraParameters.create((100., 100.), (50., 40.)),
                            FOV.create(0.9))
    half = resize(cm, 0.5)
    assert_allclose(half.camera_parameters.focal_length, [50., 50.])
    assert_allclose(half.camera_parameters.offset, [25., 20.])


def test_normalization_table(rng):
    cm = CameraModel.create(
        CameraParameters.create((40., 40.), (20., 15.)), FOV.create(0.6))
    table = NormalizationMapTable(cm, (30, 40))
    us = jnp.asarray(rng.uniform(1, 28, (10, 2)).astype(np.float32))
    assert_allclose(table.normalize(us), cm.normalize(us),
                    rtol=1e-2, atol=1e-3)
