import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose
from scipy.spatial.transform import Rotation

from tadataka_tpu.core.so3 import hat_so3, exp_so3, log_so3
from tadataka_tpu.core.se3 import exp_se3, log_se3, exp_se3_t


def test_hat_so3():
    v = jnp.array([1.0, 2.0, 3.0])
    expected = np.array([
        [0, -3, 2],
        [3, 0, -1],
        [-2, 1, 0],
    ], dtype=np.float32)
    assert_allclose(hat_so3(v), expected)
    # batched
    V = jnp.stack([v, 2 * v])
    assert hat_so3(V).shape == (2, 3, 3)


def test_exp_so3_matches_scipy(rng):
    for _ in range(20):
        rotvec = rng.uniform(-2, 2, 3).astype(np.float32)
        R_expected = Rotation.from_rotvec(rotvec).as_matrix()
        assert_allclose(exp_so3(jnp.asarray(rotvec)), R_expected,
                        rtol=1e-4, atol=1e-5)


def test_exp_so3_zero():
    assert_allclose(exp_so3(jnp.zeros(3)), np.eye(3), atol=1e-7)


def test_log_so3_roundtrip(rng):
    for scale in [1e-6, 1e-3, 0.5, 2.0, 3.0]:
        rotvec = rng.uniform(-1, 1, 3)
        rotvec = scale * rotvec / np.linalg.norm(rotvec)
        rotvec = rotvec.astype(np.float32)
        out = log_so3(exp_so3(jnp.asarray(rotvec)))
        assert_allclose(out, rotvec, rtol=1e-3, atol=1e-5)


def test_log_so3_near_pi(rng):
    # angles near pi are the hard case for matrix->rotvec
    axis = rng.uniform(-1, 1, 3)
    axis /= np.linalg.norm(axis)
    rotvec = (np.pi - 1e-4) * axis
    R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    recovered = np.asarray(log_so3(jnp.asarray(R)))
    # rotvec near pi is unique up to sign of the full vector
    err = min(np.linalg.norm(recovered - rotvec),
              np.linalg.norm(recovered + rotvec))
    assert err < 1e-2


def test_exp_so3_grad_at_zero():
    # gradient must be finite at exactly zero (Taylor branch)
    g = jax.jacfwd(exp_so3)(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_exp_se3_matches_closed_form(rng):
    # validate against the scipy-based closed form of the reference
    def reference_exp_se3(xi):
        v, omega = xi[:3], xi[3:]
        theta = np.linalg.norm(omega)
        R = Rotation.from_rotvec(omega).as_matrix()
        if theta < 1e-10:
            V = np.eye(3)
        else:
            K = Rotation.from_rotvec(omega / theta).as_matrix()  # placeholder
            K = np.array([[0, -omega[2], omega[1]],
                          [omega[2], 0, -omega[0]],
                          [-omega[1], omega[0], 0]]) / theta
            V = (np.eye(3) + (1 - np.cos(theta)) / theta * K +
                 (theta - np.sin(theta)) / theta * K @ K)
        G = np.eye(4)
        G[:3, :3] = R
        G[:3, 3] = V @ v
        return G

    for _ in range(10):
        xi = rng.uniform(-1, 1, 6).astype(np.float32)
        assert_allclose(exp_se3(jnp.asarray(xi)), reference_exp_se3(xi),
                        rtol=1e-4, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(10):
        xi = rng.uniform(-1, 1, 6).astype(np.float32)
        out = log_se3(exp_se3(jnp.asarray(xi)))
        assert_allclose(out, xi, rtol=1e-3, atol=1e-4)


def test_exp_se3_t_zero_rotation():
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    assert_allclose(exp_se3_t(xi), [1.0, 2.0, 3.0], atol=1e-6)
