"""Pose-optimization tests — reproduces the reference's one real synthetic
fixture (test_PoseOptimization, test/test_vo.cpp:305-355: sample 3D points,
project through a known (R, t), optimize from identity, compare) plus
noise/outlier robustness the reference never tested."""

import numpy as np
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.solvers import pose_opt
from trackingbench_slam_tpu.utils.config import CameraConfig, SolverConfig


CAM = cam_mod.CameraParams.from_config(
    CameraConfig(width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0))


def _synthetic(rng, n=200, noise=0.0, outlier_frac=0.0,
               xi=(0.1, -0.05, 0.08, 0.02, -0.03, 0.05)):
    pts = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4, 12, size=n)
    T_true = se3.exp(jnp.asarray(xi, jnp.float32))
    pc = se3.transform_points(T_true, jnp.asarray(pts))
    px = np.asarray(cam_mod.world2cam(CAM, pc))
    if noise > 0:
        px = px + rng.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        px[idx] += rng.uniform(20, 80, size=(n_out, 2)) * np.sign(rng.randn(n_out, 2))
        out_mask = np.zeros(n, bool)
        out_mask[idx] = True
    else:
        out_mask = np.zeros(n, bool)
    return pts, px.astype(np.float32), T_true, out_mask


def test_recovers_exact_pose(rng):
    pts, px, T_true, _ = _synthetic(rng)
    res = pose_opt.pose_optimization(
        CAM, jnp.eye(4, dtype=jnp.float32), jnp.asarray(pts), jnp.asarray(px),
        jnp.ones((pts.shape[0],), jnp.float32), jnp.ones((pts.shape[0],), bool))
    err = np.asarray(se3.log(se3.compose(res.T_cw, se3.inverse(T_true))))
    assert np.abs(err).max() < 1e-3, err
    assert int(res.num_inliers) == pts.shape[0]


def test_robust_to_outliers(rng):
    pts, px, T_true, out_mask = _synthetic(rng, noise=0.5, outlier_frac=0.25)
    res = pose_opt.pose_optimization(
        CAM, jnp.eye(4, dtype=jnp.float32), jnp.asarray(pts), jnp.asarray(px),
        jnp.ones((pts.shape[0],), jnp.float32), jnp.ones((pts.shape[0],), bool))
    err = np.asarray(se3.log(se3.compose(res.T_cw, se3.inverse(T_true))))
    # translation within a few cm, rotation within ~0.5 deg despite 25% outliers
    assert np.abs(err[:3]).max() < 0.05, err
    assert np.abs(err[3:]).max() < 0.01, err
    # the chi2 gate finds the planted outliers
    inl = np.asarray(res.inliers)
    assert (~inl[out_mask]).mean() > 0.9  # most outliers rejected
    assert inl[~out_mask].mean() > 0.9    # most inliers kept


def test_respects_valid_mask(rng):
    pts, px, T_true, _ = _synthetic(rng)
    # poison half the observations but mask them out
    px2 = px.copy()
    px2[::2] += 500.0
    valid = np.ones(pts.shape[0], bool)
    valid[::2] = False
    res = pose_opt.pose_optimization(
        CAM, jnp.eye(4, dtype=jnp.float32), jnp.asarray(pts), jnp.asarray(px2),
        jnp.ones((pts.shape[0],), jnp.float32), jnp.asarray(valid))
    err = np.asarray(se3.log(se3.compose(res.T_cw, se3.inverse(T_true))))
    assert np.abs(err).max() < 1e-3, err


def test_level_weights():
    w = np.asarray(pose_opt.level_inv_sigma2(jnp.asarray([0, 1, 2]), 0.8))
    np.testing.assert_allclose(w, [1.0, 0.64, 0.4096], rtol=1e-5)


def test_larger_motion_converges(rng):
    pts, px, T_true, _ = _synthetic(
        rng, xi=(0.5, 0.3, -0.4, 0.1, 0.15, -0.1))
    res = pose_opt.pose_optimization(
        CAM, jnp.eye(4, dtype=jnp.float32), jnp.asarray(pts), jnp.asarray(px),
        jnp.ones((pts.shape[0],), jnp.float32), jnp.ones((pts.shape[0],), bool))
    err = np.asarray(se3.log(se3.compose(res.T_cw, se3.inverse(T_true))))
    assert np.abs(err).max() < 1e-3, err
