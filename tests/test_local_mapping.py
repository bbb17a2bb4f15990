"""Live local-mapping stage: window-problem construction, the stereo BA
rows' scale observability, and the end-to-end drift reduction the VERDICT
asked for ("a test showing drift on a 40+ frame sequence drops measurably
with BA on vs off")."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.solvers import local_ba
from trackingbench_slam_tpu.utils.config import CameraConfig

FX = 400.0
BF = FX * 0.3
CAM = cam_mod.CameraParams.from_config(
    CameraConfig(width=512, height=384, fx=FX, fy=FX, cx=256, cy=192, bf=BF))


def _synthetic_window(rng, K=4, M=80):
    """K cameras along +x, M landmarks 4-12 m ahead; exact observations."""
    T_gt = []
    for k in range(K):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -0.3 * k  # camera center at +0.3k (world->cam translation)
        T_gt.append(T)
    T_gt = np.stack(T_gt)
    xn = (rng.rand(M) - 0.5) * 1.0
    yn = (rng.rand(M) - 0.5) * 0.7
    z = 4.0 + 8.0 * rng.rand(M)
    pts = np.stack([xn * z, yn * z, z], -1).astype(np.float32)

    obs_kf, obs_lm, obs_px, obs_ur = [], [], [], []
    for k in range(K):
        pc = pts @ T_gt[k][:3, :3].T + T_gt[k][:3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + 256
        v = FX * pc[:, 1] / pc[:, 2] + 192
        inb = (u > 10) & (u < 502) & (v > 10) & (v < 374)
        for m in np.where(inb)[0]:
            obs_kf.append(k)
            obs_lm.append(m)
            obs_px.append([u[m], v[m]])
            obs_ur.append(u[m] - BF / pc[m, 2])
    O = len(obs_kf)
    return T_gt, pts, dict(
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_px=jnp.asarray(np.asarray(obs_px), jnp.float32),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool),
        obs_ur=jnp.asarray(obs_ur, jnp.float32))


def _scale_about_first_cam(T_cw, pts, s):
    """Similarity-scale the whole window about camera 0's center (the
    classic mono gauge direction)."""
    T = T_cw.copy()
    for k in range(T.shape[0]):
        T[k, :3, 3] = T[k, :3, 3] * s
    return T, pts * s


def _cam_centers(T_cw):
    return np.stack([-T[:3, :3].T @ T[:3, 3] for T in np.asarray(T_cw)])


def test_stereo_rows_pin_scale(rng):
    """A mono window with one clamped pose has scale as a free gauge: BA
    leaves a planted 10% scale error in place. The stereo u_R rows make
    scale observable and BA must remove it."""
    T_gt, pts_gt, obs = _synthetic_window(rng)
    T0, pts0 = _scale_about_first_cam(T_gt, pts_gt, 1.10)

    prob_mono = local_ba.BAProblem(
        T_cw=jnp.asarray(T0), points=jnp.asarray(pts0),
        **{k: v for k, v in obs.items() if k != "obs_ur"})
    prob_st = local_ba.BAProblem(
        T_cw=jnp.asarray(T0), points=jnp.asarray(pts0), **obs)

    res_m = local_ba.bundle_adjust(CAM, prob_mono, iters=15, num_fixed=1)
    res_s = local_ba.bundle_adjust(CAM, prob_st, iters=15, num_fixed=1)

    c_gt = _cam_centers(T_gt)
    err_m = np.linalg.norm(_cam_centers(res_m.T_cw) - c_gt, axis=1).max()
    err_s = np.linalg.norm(_cam_centers(res_s.T_cw) - c_gt, axis=1).max()
    # the planted error at the farthest camera is 0.1 * 0.9 m = 9 cm
    assert err_m > 0.05, err_m        # mono: scale gauge untouched
    assert err_s < 0.005, err_s       # stereo: scale recovered to < 5 mm
    # and landmark depths return to truth
    z_err = np.abs(np.asarray(res_s.points)[:, 2] - pts_gt[:, 2]).mean()
    assert z_err < 0.02, z_err


def test_stereo_ba_corrects_perturbed_window(rng):
    """General accuracy: perturb all non-fixed poses and landmarks; stereo
    BA must pull them back."""
    T_gt, pts_gt, obs = _synthetic_window(rng)
    T0 = T_gt.copy()
    for k in range(1, T0.shape[0]):
        T0[k, :3, 3] += rng.randn(3).astype(np.float32) * 0.03
    pts0 = pts_gt + rng.randn(*pts_gt.shape).astype(np.float32) * 0.05
    prob = local_ba.BAProblem(T_cw=jnp.asarray(T0),
                              points=jnp.asarray(pts0), **obs)
    res = local_ba.bundle_adjust(CAM, prob, iters=15, num_fixed=1)
    c_err = np.linalg.norm(_cam_centers(res.T_cw)
                           - _cam_centers(T_gt), axis=1).max()
    assert c_err < 0.003, c_err
    p_err = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    assert np.median(p_err) < 0.01, np.median(p_err)


def test_build_window_problem_from_live_state():
    """The window builder flattens the map's observation lists with the
    right keyframe ordering and validity."""
    from trackingbench_slam_tpu.models import map as map_mod
    from trackingbench_slam_tpu.models.local_mapping import (
        build_window_problem)

    kfs = map_mod.empty_keyframes(4, 8)
    m = map_mod.empty_map(16, 4)
    # two keyframes inserted out of slot order with distinct frame ids
    class _F:
        pass
    import jax
    def frame(px, fid):
        f = _F()
        f.T_cw = jnp.eye(4)
        f.kp_xy = jnp.asarray(px, jnp.float32)
        f.kp_level = jnp.zeros((8,), jnp.int32)
        f.kp_angle = jnp.zeros((8,), jnp.float32)
        f.desc = jnp.zeros((8, 8), jnp.uint32)
        f.bearing = jnp.zeros((8, 3), jnp.float32)
        f.map_idx = jnp.full((8,), -1, jnp.int32)
        f.valid = jnp.ones((8,), bool)
        return f
    px0 = np.tile([[10.0, 20.0]], (8, 1))
    px1 = np.tile([[30.0, 40.0]], (8, 1))
    kfs, _ = map_mod.insert_keyframe(kfs, frame(px1, 7), 7,
                                     slot=jnp.asarray(2))
    kfs, _ = map_mod.insert_keyframe(kfs, frame(px0, 3), 3,
                                     slot=jnp.asarray(0))
    m, slots = map_mod.add_points(
        m, jnp.ones((2, 3)), jnp.zeros((2, 8), jnp.uint32),
        jnp.zeros((2, 3)), jnp.zeros((2,)), jnp.ones((2,)) * 10,
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        jnp.ones((2,), bool))
    m = map_mod.add_observations(m, slots, 0, jnp.asarray([1, 2]),
                                 jnp.ones((2,), bool))
    m = map_mod.add_observations(m, slots, 2, jnp.asarray([3, 4]),
                                 jnp.ones((2,), bool))
    prob, order = build_window_problem(m, kfs, 0.8)
    order = np.asarray(order)
    # oldest (frame 3, slot 0) first
    assert order[0] == 0 and order[1] == 2
    ok = np.asarray(prob.obs_valid)
    assert ok.sum() == 4
    dense_kf = np.asarray(prob.obs_kf)[ok]
    px = np.asarray(prob.obs_px)[ok]
    # slot 0 obs -> dense 0 with px0; slot 2 -> dense 1 with px1
    assert set(dense_kf) == {0, 1}
    assert np.allclose(px[dense_kf == 0], [10.0, 20.0])
    assert np.allclose(px[dense_kf == 1], [30.0, 40.0])


@pytest.mark.slow
def test_local_ba_reduces_drift_on_corridor():
    """End-to-end: 45-frame rotating corridor, BA on vs off; the endpoint
    drift and the aligned ATE must both improve with BA on."""
    from trackingbench_slam_tpu.models.vo import StereoVO
    from trackingbench_slam_tpu.utils import metrics
    from trackingbench_slam_tpu.utils.config import (
        ExtractorConfig, MapConfig, PipelineConfig, PyramidConfig)
    from trackingbench_slam_tpu.utils.synthetic import (
        CorridorScene, forward_yaw_trajectory)

    cam = CameraConfig(width=512, height=384, fx=400, fy=400, cx=256,
                       cy=192, bf=400 * 0.3)
    base = dict(camera=cam,
                pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
                extractor=ExtractorConfig(num_features=800, min_threshold=10,
                                          cell_size=24),
                map=MapConfig(max_keyframes=12, max_points=8192),
                keyframe_every=5)
    scene = CorridorScene(cam)
    n = 45
    gt = forward_yaw_trajectory(n, step=0.10, yaw_rate=0.012)
    frames = []
    for i, T in enumerate(gt):
        if i == 0 or (i + 1) % 5 == 0:
            frames.append(scene.stereo_pair(T, 0.3))
        else:
            frames.append((scene.render(T), None))
    results = {}
    for ba in (0, 2):
        cfg = PipelineConfig(local_ba_every=ba, **base)
        vo = StereoVO(cfg)
        for L, R in frames:
            vo.track(L, R)
        P = vo.poses()
        ate = metrics.ate_rmse(P, gt, align=True)
        ee = np.linalg.norm(np.linalg.inv(P[-1])[:3, 3]
                            - np.linalg.inv(gt[-1])[:3, 3])
        results[ba] = (ate, ee)
    ate_off, ee_off = results[0]
    ate_on, ee_on = results[2]
    assert ee_on < ee_off, results   # endpoint drift drops
    assert ate_on < ate_off, results  # BA must strictly improve aligned ATE


def test_grouped_ba_matches_flat(rng):
    """The scatter-free grouped formulation must solve the same problem as
    the flat obs-list path."""
    T_gt, pts_gt, obs = _synthetic_window(rng)
    T0 = T_gt.copy()
    for k in range(1, T0.shape[0]):
        T0[k, :3, 3] += rng.randn(3).astype(np.float32) * 0.02
    pts0 = pts_gt + rng.randn(*pts_gt.shape).astype(np.float32) * 0.03
    prob = local_ba.BAProblem(T_cw=jnp.asarray(T0),
                              points=jnp.asarray(pts0), **obs)
    res_flat = local_ba.bundle_adjust(CAM, prob, iters=12, num_fixed=1)

    # regroup the flat obs into the (L, O) layout
    M = pts_gt.shape[0]
    O = 8
    g_kf = -np.ones((M, O), np.int32)
    g_px = np.zeros((M, O, 2), np.float32)
    g_ur = -np.ones((M, O), np.float32)
    g_ok = np.zeros((M, O), bool)
    g_is = np.ones((M, O), np.float32)
    counts = np.zeros(M, np.int32)
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
        obs_inv_sigma2=jnp.asarray(g_is), obs_valid=jnp.asarray(g_ok),
        obs_ur=jnp.asarray(g_ur))
    T_g, X_g = local_ba.bundle_adjust_grouped(CAM, gprob, iters=12,
                                              num_fixed=1)
    c_err = np.linalg.norm(_cam_centers(T_g) - _cam_centers(res_flat.T_cw),
                           axis=1).max()
    assert c_err < 1e-3, c_err
    p_err = np.linalg.norm(np.asarray(X_g) - np.asarray(res_flat.points),
                           axis=1)
    assert np.median(p_err) < 2e-3, np.median(p_err)


def test_window_aware_compaction_prefers_window_landmarks():
    """Landmarks observed by the NEWEST (optimized) keyframes must win the
    compaction over old landmarks with more total observations — ranking
    by total count alone starved the optimized poses of constraints on
    rotation-heavy trajectories (round-5 loop-bench divergence)."""
    from trackingbench_slam_tpu.models import map as map_mod
    from trackingbench_slam_tpu.models.local_mapping import (
        build_window_problem_grouped)

    KF, N, M, K_obs = 8, 16, 64, 16
    kfs = map_mod.empty_keyframes(KF, N)
    kfs = kfs._replace(valid=jnp.ones((KF,), bool),
                       frame_id=jnp.arange(KF, dtype=jnp.int32),
                       kp_valid=jnp.ones((KF, N), bool))
    m = map_mod.empty_map(M, K_obs)
    obs_kf = np.full((M, K_obs), -1, np.int32)
    obs_feat = np.full((M, K_obs), -1, np.int32)
    # landmarks 0..31: observed by the 6 OLDEST keyframes (6 obs each);
    # landmarks 32..47: observed by only the 2 NEWEST keyframes (2 obs)
    for lm in range(32):
        for j in range(6):
            obs_kf[lm, j] = j          # ring slots 0..5 = oldest
            obs_feat[lm, j] = lm % N
    for lm in range(32, 48):
        for j in range(2):
            obs_kf[lm, j] = 6 + j      # ring slots 6,7 = newest
            obs_feat[lm, j] = lm % N
    valid = np.zeros(M, bool)
    valid[:48] = True
    m = m._replace(obs_kf=jnp.asarray(obs_kf),
                   obs_feat=jnp.asarray(obs_feat),
                   valid=jnp.asarray(valid))

    # window = 2 newest keyframes; room for only 16 landmarks
    _, _, lm_idx = build_window_problem_grouped(
        m, kfs, 0.8, max_landmarks=16, window_keyframes=2)
    sel = set(np.asarray(lm_idx).tolist())
    assert sel == set(range(32, 48)), sel

    # without window-awareness the old 6-obs landmarks win instead
    _, _, lm_idx0 = build_window_problem_grouped(
        m, kfs, 0.8, max_landmarks=16, window_keyframes=0)
    sel0 = set(np.asarray(lm_idx0).tolist())
    assert sel0.issubset(set(range(32))), sel0
