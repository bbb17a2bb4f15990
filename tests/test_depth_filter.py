"""Depth-filter unit tests (the component the reference stubbed at
src/mapping/DepthFilter.cpp:1-5 and round 1 implemented but never called:
VERDICT row 9) + the DirectVO integration (mono keyframes after a stereo
bootstrap)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.solvers import depth_filter as df


def test_update_seeds_converges_on_consistent_observations(rng):
    """Noisy-but-consistent inverse-depth observations drive sigma below
    the convergence threshold and the mean to truth."""
    S = 64
    z_true = 4.0 + 6.0 * rng.rand(S).astype(np.float32)
    seeds = df.SeedState.init(
        jnp.asarray(np.full(S, 8.0, np.float32)),   # wrong prior mean
        jnp.asarray(np.full(S, 0.5, np.float32)),
        jnp.ones((S,), bool))
    tau = 0.02 * z_true  # ~2% depth std per observation
    for _ in range(30):
        z_obs = z_true + rng.randn(S).astype(np.float32) * tau
        tau2 = np.asarray(df.tau_inverse(jnp.asarray(z_obs),
                                         jnp.asarray(tau))) ** 2
        seeds = df.update_seeds(seeds, jnp.asarray(1.0 / z_obs),
                                jnp.asarray(tau2), jnp.ones((S,), bool))
    conv, div = df.seed_status(seeds)
    assert np.asarray(conv).mean() > 0.9, np.asarray(conv).mean()
    assert not np.asarray(div).any()
    z_est = np.asarray(df.seed_depths(seeds))
    rel = np.abs(z_est - z_true) / z_true
    assert np.median(rel) < 0.02, np.median(rel)


def test_update_seeds_diverges_on_outlier_observations():
    """Uniform-random observations (pure outliers) must drive the Beta
    inlier ratio below the divergence threshold, not converge."""
    rng = np.random.RandomState(0)  # own stream: the shared session rng
    # makes the divergence census order-dependent
    S = 64
    seeds = df.SeedState.init(
        jnp.asarray(np.full(S, 5.0, np.float32)),
        jnp.asarray(np.full(S, 0.5, np.float32)),
        jnp.ones((S,), bool))
    mid_conv = None
    for it in range(250):
        z_obs = 0.5 + 50.0 * rng.rand(S).astype(np.float32)  # junk
        tau2 = np.full(S, 1e-6, np.float32)  # confidently wrong
        seeds = df.update_seeds(seeds, jnp.asarray(1.0 / z_obs),
                                jnp.asarray(tau2), jnp.ones((S,), bool))
        if it == 40:
            mid_conv, _ = df.seed_status(seeds)
    # junk must never PROMOTE, even early while sigma collapses...
    assert not np.asarray(mid_conv).any()
    conv, div = df.seed_status(seeds)
    assert np.asarray(conv).mean() < 0.05
    # ...and the Beta inlier ratio flags divergence for a solid fraction
    # (seeds whose collapsed mode happens to sit amid the junk distribution
    # keep collecting chance hits and stay undecided — that's correct;
    # what matters is they never promote)
    assert np.asarray(div).mean() > 0.15, np.asarray(div).mean()


def test_depth_from_triangulation_exact(rng):
    """Exact two-view geometry recovers ref-ray depth."""
    from trackingbench_slam_tpu.geometry import se3
    S = 128
    f_ref = rng.randn(S, 3).astype(np.float32) * np.array([0.3, 0.3, 0.0]) \
        + np.array([0, 0, 1.0])
    f_ref /= np.linalg.norm(f_ref, axis=-1, keepdims=True)
    z = (2.0 + 10.0 * rng.rand(S)).astype(np.float32)
    p_ref = f_ref * z[:, None]
    T_cur_ref = np.asarray(se3.exp(jnp.asarray(
        [0.3, 0.05, -0.02, 0.01, 0.03, -0.01], jnp.float32)))
    p_cur = p_ref @ T_cur_ref[:3, :3].T + T_cur_ref[:3, 3]
    f_cur = p_cur / np.linalg.norm(p_cur, axis=-1, keepdims=True)
    z_est, ok = df.depth_from_triangulation(
        jnp.asarray(T_cur_ref), jnp.asarray(f_ref), jnp.asarray(f_cur))
    ok = np.asarray(ok)
    assert ok.mean() > 0.95
    err = np.abs(np.asarray(z_est)[ok] - z[ok])
    assert err.max() < 1e-2, err.max()


def test_compute_tau_shrinks_with_baseline():
    """Depth uncertainty for one pixel of disparity falls as the baseline
    grows (the triangulation geometry sanity check)."""
    f = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    z = jnp.asarray([5.0], jnp.float32)
    angle = jnp.arctan(0.5 / 400.0) * 2
    t_small = jnp.asarray([0.05, 0.0, 0.0], jnp.float32)
    t_large = jnp.asarray([0.5, 0.0, 0.0], jnp.float32)
    tau_s = float(df.compute_tau(t_small, f, z, angle)[0])
    tau_l = float(df.compute_tau(t_large, f, z, angle)[0])
    assert tau_l < tau_s * 0.2, (tau_s, tau_l)


@pytest.mark.slow
def test_direct_vo_mono_keyframes_after_stereo_bootstrap():
    """DirectVO with stereo ONLY at frame 0: later keyframes are mono, so
    every new landmark must come from depth-filter seed promotion — and
    tracking accuracy must hold."""
    from trackingbench_slam_tpu.models.direct_vo import DirectVO
    from trackingbench_slam_tpu.utils import metrics
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, DirectConfig, ExtractorConfig, PipelineConfig,
        PyramidConfig)
    from trackingbench_slam_tpu.utils.synthetic import (
        CorridorScene, forward_yaw_trajectory)

    cam = CameraConfig(width=512, height=384, fx=400, fy=400, cx=256,
                       cy=192, bf=400 * 0.3)
    cfg = PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=4, scale_factor=0.5),
        extractor=ExtractorConfig(num_features=512, min_threshold=10,
                                  cell_size=24),
        direct=DirectConfig(max_level=3),
        keyframe_every=6)
    scene = CorridorScene(cam)
    n = 24
    gt = forward_yaw_trajectory(n, step=0.05, yaw_rate=0.004)
    vo = DirectVO(cfg)
    for i, T in enumerate(gt):
        if i == 0:
            L, R = scene.stereo_pair(T, 0.3)
            vo.track(L, R)
        else:
            vo.track(scene.render(T))  # mono from here on
    assert vo.num_promoted > 50, vo.num_promoted
    assert vo.num_tracked > 80, vo.num_tracked
    ate = metrics.ate_rmse(vo.poses(), gt, align=True)
    assert ate < 0.03, ate
