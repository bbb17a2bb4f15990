"""Windowed BA + pose-graph solver tests on synthetic geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.solvers import local_ba, pose_graph
from trackingbench_slam_tpu.utils.config import CameraConfig

CAM = cam_mod.CameraParams.from_config(
    CameraConfig(width=640, height=480, fx=500.0, fy=500.0, cx=320.0, cy=240.0))


def _window(rng, K=6, M=300, obs_per_lm=4, px_noise=0.3):
    """Random window: poses along x, landmarks in front, each landmark
    observed by a few poses."""
    T_true = []
    for k in range(K):
        xi = np.concatenate([[0.3 * k, 0.01 * k, 0.0],
                             rng.randn(3) * 0.02])
        T_true.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
    T_true = np.stack(T_true)
    X_true = rng.uniform(-3, 3, (M, 3)).astype(np.float32)
    X_true[:, 2] = rng.uniform(5, 15, M)
    obs_kf, obs_lm, obs_px = [], [], []
    for m in range(M):
        ks = rng.choice(K, obs_per_lm, replace=False)
        for k in ks:
            pc = T_true[k, :3, :3] @ X_true[m] + T_true[k, :3, 3]
            px = np.asarray(cam_mod.world2cam(CAM, jnp.asarray(pc)))
            if 0 <= px[0] < 640 and 0 <= px[1] < 480 and pc[2] > 0.1:
                obs_kf.append(k)
                obs_lm.append(m)
                obs_px.append(px + rng.randn(2) * px_noise)
    O = len(obs_kf)
    return (T_true, X_true,
            np.asarray(obs_kf, np.int32), np.asarray(obs_lm, np.int32),
            np.asarray(obs_px, np.float32), O)


def test_ba_recovers_perturbed_window(rng):
    T_true, X_true, obs_kf, obs_lm, obs_px, O = _window(rng, px_noise=0.0)
    K, M = T_true.shape[0], X_true.shape[0]
    # perturb everything except poses 0-1 (gauge incl. monocular scale)
    T0 = T_true.copy()
    for k in range(2, K):
        d = np.concatenate([rng.randn(3) * 0.05, rng.randn(3) * 0.01])
        T0[k] = np.asarray(se3.compose(se3.exp(jnp.asarray(d, jnp.float32)),
                                       jnp.asarray(T0[k])))
    X0 = X_true + rng.randn(M, 3).astype(np.float32) * 0.05
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(T0, jnp.float32), points=jnp.asarray(X0),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(obs_px),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool))
    res = local_ba.bundle_adjust(CAM, prob, iters=15, num_fixed=2)
    T_est = np.asarray(res.T_cw)
    for k in range(K):
        err = np.asarray(se3.log(se3.compose(
            jnp.asarray(T_est[k]), se3.inverse(jnp.asarray(T_true[k])))))
        assert np.abs(err).max() < 2e-3, (k, err)
    lm_err = np.linalg.norm(np.asarray(res.points) - X_true, axis=1)
    assert np.median(lm_err) < 0.01, np.median(lm_err)


def test_ba_reduces_reprojection_error_with_noise(rng):
    T_true, X_true, obs_kf, obs_lm, obs_px, O = _window(rng, px_noise=0.5)
    K, M = T_true.shape[0], X_true.shape[0]
    T0 = T_true.copy()
    for k in range(2, K):
        d = np.concatenate([rng.randn(3) * 0.03, rng.randn(3) * 0.005])
        T0[k] = np.asarray(se3.compose(se3.exp(jnp.asarray(d, jnp.float32)),
                                       jnp.asarray(T0[k])))
    X0 = X_true + rng.randn(M, 3).astype(np.float32) * 0.03
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(T0, jnp.float32), points=jnp.asarray(X0),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(obs_px),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool))

    def mean_reproj(T, X):
        r, _, _, _, _ = local_ba._obs_residuals(CAM, jnp.asarray(T),
                                                jnp.asarray(X), prob)
        return float(jnp.mean(jnp.linalg.norm(r, axis=-1)))

    before = mean_reproj(T0, X0)
    res = local_ba.bundle_adjust(CAM, prob, iters=15, num_fixed=2)
    after = mean_reproj(np.asarray(res.T_cw), np.asarray(res.points))
    assert after < 0.7  # ~ noise floor (0.5 px gaussian)
    assert after < before * 0.2, (before, after)
    assert np.asarray(res.inliers).mean() > 0.95


def test_ba_respects_invalid_observations(rng):
    T_true, X_true, obs_kf, obs_lm, obs_px, O = _window(rng, px_noise=0.0)
    # poison half the observations, mark invalid
    px = obs_px.copy()
    px[::2] += 300.0
    valid = np.ones(O, bool)
    valid[::2] = False
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(T_true, jnp.float32),
        points=jnp.asarray(X_true + 0.02),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(px),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.asarray(valid))
    res = local_ba.bundle_adjust(CAM, prob, iters=12)
    # the valid half must be fit to ~zero residual; the poisoned half must
    # NOT be fit (it was masked out, 300 px residuals remain)
    r, _, _, _, _ = local_ba._obs_residuals(CAM, res.T_cw, res.points, prob)
    rn = np.linalg.norm(np.asarray(r), axis=-1)
    assert np.median(rn[valid]) < 0.1, np.median(rn[valid])
    assert np.median(rn[~valid]) > 100.0


def test_pose_graph_closes_loop():
    """Odometry chain with drift + one loop-closure edge pulls the chain
    back to ground truth."""
    rng = np.random.RandomState(42)  # own stream: drift magnitude matters
    K = 12
    # ground truth: circle-ish path
    T_true = []
    for k in range(K):
        xi = np.array([0.5 * np.sin(k * 0.5), 0.5 * (1 - np.cos(k * 0.5)), 0,
                       0, 0, k * 0.5 * 0.2], np.float32)
        T_true.append(np.asarray(se3.exp(jnp.asarray(xi))))
    T_true = np.stack(T_true)
    # odometry edges with accumulating noise in the initial guess
    T0 = [T_true[0]]
    for k in range(1, K):
        rel = np.asarray(se3.compose(jnp.asarray(T_true[k]),
                                     se3.inverse(jnp.asarray(T_true[k - 1]))))
        d = np.concatenate([rng.randn(3) * 0.02, rng.randn(3) * 0.005])
        noisy_rel = np.asarray(se3.compose(se3.exp(jnp.asarray(d, jnp.float32)),
                                           jnp.asarray(rel)))
        T0.append(np.asarray(se3.compose(jnp.asarray(noisy_rel),
                                         jnp.asarray(T0[-1]))))
    T0 = np.stack(T0)
    drift = np.linalg.norm(T0[-1, :3, 3] - T_true[-1, :3, 3])
    # edges: exact consecutive measurements + loop closure 0 <-> K-1
    ei, ej, Tm = [], [], []
    for k in range(K - 1):
        ei.append(k); ej.append(k + 1)
        Tm.append(np.asarray(se3.compose(jnp.asarray(T_true[k]),
                                         se3.inverse(jnp.asarray(T_true[k + 1])))))
    ei.append(0); ej.append(K - 1)
    Tm.append(np.asarray(se3.compose(jnp.asarray(T_true[0]),
                                     se3.inverse(jnp.asarray(T_true[K - 1])))))
    g = pose_graph.PoseGraph(
        T_cw=jnp.asarray(T0, jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        T_meas=jnp.asarray(np.stack(Tm), jnp.float32),
        weight=jnp.ones((len(ei),), jnp.float32),
        valid=jnp.ones((len(ei),), bool))
    T_opt, cost = pose_graph.optimize_pose_graph(g, iters=25)
    T_opt = np.asarray(T_opt)
    for k in range(K):
        err = np.asarray(se3.log(se3.compose(
            jnp.asarray(T_opt[k]), se3.inverse(jnp.asarray(T_true[k])))))
        assert np.abs(err).max() < 3e-3, (k, err, drift)
    assert drift > 0.05  # the initial guess really had drift to correct
