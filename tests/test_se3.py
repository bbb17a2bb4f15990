"""SE3 unit tests against scipy/numpy oracles."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import se3


def test_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.randn(6) * 0.5
        T = se3.exp(jnp.asarray(xi, jnp.float32))
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)


def test_exp_matches_scipy_rotation(rng):
    for _ in range(10):
        phi = rng.randn(3)
        T = se3.exp(jnp.asarray(np.concatenate([np.zeros(3), phi]), jnp.float32))
        R_ref = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(np.asarray(T[:3, :3]), R_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T[:3, 3]), 0.0, atol=1e-6)


def test_small_angle_stability():
    xi = jnp.asarray([1e-9, 0, 0, 0, 1e-10, 0], jnp.float32)
    T = se3.exp(xi)
    assert np.all(np.isfinite(np.asarray(T)))
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-6)
    xi0 = se3.log(jnp.eye(4, dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(xi0)))


def test_inverse_compose(rng):
    xi = rng.randn(6).astype(np.float32) * 0.3
    T = se3.exp(jnp.asarray(xi))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_transform_points(rng):
    xi = rng.randn(6).astype(np.float32) * 0.3
    T = se3.exp(jnp.asarray(xi))
    pts = rng.randn(17, 3).astype(np.float32)
    out = se3.transform_points(T, jnp.asarray(pts))
    Tn = np.asarray(T)
    ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_normalize_restores_orthonormality(rng):
    xi = rng.randn(6).astype(np.float32)
    T = np.array(se3.exp(jnp.asarray(xi)))
    T[:3, :3] += rng.randn(3, 3) * 1e-3
    Tn = np.asarray(se3.normalize(jnp.asarray(T)))
    R = Tn[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0
