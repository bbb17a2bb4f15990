"""Distributed BA tests on the 8-virtual-device CPU mesh: the sharded solver
must agree with the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.parallel import dist_ba, mesh as mesh_mod
from trackingbench_slam_tpu.solvers import local_ba
from tests.test_local_ba import _window, CAM


def _problem(rng, perturb=True):
    T_true, X_true, obs_kf, obs_lm, obs_px, O = _window(rng, K=6, M=256,
                                                        px_noise=0.0)
    K, M = T_true.shape[0], X_true.shape[0]
    T0 = T_true.copy()
    if perturb:
        for k in range(2, K):
            d = np.concatenate([rng.randn(3) * 0.04, rng.randn(3) * 0.01])
            T0[k] = np.asarray(se3.compose(
                se3.exp(jnp.asarray(d, jnp.float32)), jnp.asarray(T0[k])))
    X0 = X_true + rng.randn(M, 3).astype(np.float32) * 0.04
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(T0, jnp.float32), points=jnp.asarray(X0),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_px=jnp.asarray(obs_px),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool))
    return prob, T_true, X_true


def test_partitioner_preserves_observations(rng):
    prob, _, _ = _problem(rng, perturb=False)
    sp = dist_ba.partition_problem(prob, 8)
    # every original valid observation appears exactly once with the same
    # pixel and a consistent (global) landmark index
    got = set()
    M_loc = sp.points.shape[0] // 8
    O_loc = sp.obs_px.shape[0] // 8
    for d in range(8):
        for i in range(O_loc):
            o = d * O_loc + i
            if not bool(sp.obs_valid[o]):
                continue
            glob_lm = int(sp.obs_lm[o]) + d * M_loc
            got.add((int(sp.obs_kf[o]), glob_lm,
                     float(sp.obs_px[o, 0]), float(sp.obs_px[o, 1])))
    want = set()
    for o in range(prob.obs_px.shape[0]):
        want.add((int(prob.obs_kf[o]), int(prob.obs_lm[o]),
                  float(prob.obs_px[o, 0]), float(prob.obs_px[o, 1])))
    assert got == want


def test_distributed_matches_single_device(rng):
    prob, T_true, X_true = _problem(rng)
    # single device reference
    res = local_ba.bundle_adjust(CAM, prob, iters=12, num_fixed=2)
    # 8-way sharded
    m = mesh_mod.make_mesh(lm=8)
    sp = dist_ba.partition_problem(prob, 8)
    T_d, X_d = dist_ba.distributed_bundle_adjust(m, CAM, sp, iters=12,
                                                 num_fixed=2)
    T_d = np.asarray(T_d)
    T_s = np.asarray(res.T_cw)
    for k in range(T_s.shape[0]):
        err = np.asarray(se3.log(se3.compose(
            jnp.asarray(T_d[k]), se3.inverse(jnp.asarray(T_s[k])))))
        assert np.abs(err).max() < 5e-4, (k, err)
    # both near truth
    for k in range(T_s.shape[0]):
        err = np.asarray(se3.log(se3.compose(
            jnp.asarray(T_d[k]), se3.inverse(jnp.asarray(T_true[k])))))
        assert np.abs(err).max() < 5e-3, (k, err)
    # landmark shards map back to the original layout
    M = X_true.shape[0]
    lm_err = np.linalg.norm(np.asarray(X_d)[:M] - X_true, axis=1)
    assert np.median(lm_err) < 0.02


def test_distributed_runs_on_one_device(rng):
    prob, T_true, _ = _problem(rng)
    m = mesh_mod.make_mesh(lm=1)
    sp = dist_ba.partition_problem(prob, 1)
    T_d, _ = dist_ba.distributed_bundle_adjust(m, CAM, sp, iters=10,
                                               num_fixed=2)
    err = np.asarray(se3.log(se3.compose(
        jnp.asarray(np.asarray(T_d)[3]),
        se3.inverse(jnp.asarray(T_true[3])))))
    assert np.abs(err).max() < 5e-3


def test_grouped_distributed_matches_single_device(rng):
    """The grouped (scatter-free, production) formulation sharded over the
    8-device mesh must agree with the single-device grouped solver."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_local_mapping import _synthetic_window, _cam_centers, CAM as GCAM

    T_gt, pts_gt, obs = _synthetic_window(rng, K=5, M=128)
    T0 = T_gt.copy()
    for k in range(1, T0.shape[0]):
        T0[k, :3, 3] += rng.randn(3).astype(np.float32) * 0.02
    pts0 = pts_gt + rng.randn(*pts_gt.shape).astype(np.float32) * 0.03

    # regroup into the (L, O) layout with L divisible by 8
    L, O = 128, 8
    g_kf = -np.ones((L, O), np.int32)
    g_px = np.zeros((L, O, 2), np.float32)
    g_ur = -np.ones((L, O), np.float32)
    g_ok = np.zeros((L, O), bool)
    counts = np.zeros(L, np.int32)
    for o in range(obs["obs_kf"].shape[0]):
        m_ = int(obs["obs_lm"][o])
        c = counts[m_]
        if c >= O:
            continue
        g_kf[m_, c] = int(obs["obs_kf"][o])
        g_px[m_, c] = np.asarray(obs["obs_px"][o])
        g_ur[m_, c] = float(obs["obs_ur"][o])
        g_ok[m_, c] = True
        counts[m_] += 1
    gprob = local_ba.GroupedBAProblem(
        T_cw=jnp.asarray(T0), points=jnp.asarray(pts0),
        obs_kf=jnp.asarray(g_kf), obs_px=jnp.asarray(g_px),
        obs_inv_sigma2=jnp.ones((L, O), jnp.float32),
        obs_valid=jnp.asarray(g_ok), obs_ur=jnp.asarray(g_ur))

    T_s, X_s = local_ba.bundle_adjust_grouped(GCAM, gprob, iters=10,
                                              num_fixed=1)
    m = mesh_mod.make_mesh(lm=8)
    T_d, X_d = dist_ba.distributed_bundle_adjust_grouped(
        m, GCAM, gprob, iters=10, num_fixed=1)
    for k in range(T_gt.shape[0]):
        err = np.asarray(se3.log(se3.compose(
            jnp.asarray(np.asarray(T_d)[k]),
            se3.inverse(jnp.asarray(np.asarray(T_s)[k])))))
        assert np.abs(err).max() < 5e-4, (k, err)
    lm_err = np.linalg.norm(np.asarray(X_d) - np.asarray(X_s), axis=1)
    assert np.median(lm_err) < 1e-3
