"""Monocular bootstrap + mono VO (VERDICT item 8: the round-1 'mono'
config was a matching microbench; this is a real mono pipeline with
essential-matrix initialization and scale-ambiguous evaluation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.geometry import epipolar, se3
from trackingbench_slam_tpu.utils.config import (
    CameraConfig, ExtractorConfig, MapConfig, PipelineConfig, PyramidConfig)

FX = 400.0
CAMC = CameraConfig(width=512, height=384, fx=FX, fy=FX, cx=256, cy=192)
K = np.array([[FX, 0, 256], [0, FX, 192], [0, 0, 1]], np.float32)


def test_mono_bootstrap_recovers_two_view_geometry(rng):
    """Exact synthetic matches: recover_pose must pick the cheirality-
    consistent candidate with R exact and t parallel to truth."""
    n = 200
    xn = (rng.rand(n) - 0.5) * 1.0
    yn = (rng.rand(n) - 0.5) * 0.7
    z = 4.0 + 8.0 * rng.rand(n)
    X = np.stack([xn * z, yn * z, z], -1).astype(np.float32)
    T_21 = np.asarray(se3.exp(jnp.asarray(
        [0.3, -0.05, 0.02, 0.02, 0.06, -0.01], jnp.float32)))
    p1 = X @ K.T
    px1 = p1[:, :2] / p1[:, 2:3]
    Xc2 = X @ T_21[:3, :3].T + T_21[:3, 3]
    p2 = Xc2 @ K.T
    px2 = p2[:, :2] / p2[:, 2:3]
    valid = ((px1 > 8).all(1) & (px1 < [504, 376]).all(1)
             & (px2 > 8).all(1) & (px2 < [504, 376]).all(1))

    T_est, X_est, good, ok = epipolar.mono_bootstrap(
        jnp.asarray(K), jnp.asarray(px1, jnp.float32),
        jnp.asarray(px2, jnp.float32), jnp.asarray(valid),
        jax.random.PRNGKey(0))
    assert bool(ok)
    T_est = np.asarray(T_est)
    # rotation exact
    dR = T_est[:3, :3].T @ T_21[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2, ang
    # translation parallel to truth (scale-free)
    t_est = T_est[:3, 3] / np.linalg.norm(T_est[:3, 3])
    t_gt = T_21[:3, 3] / np.linalg.norm(T_21[:3, 3])
    assert np.abs(np.dot(t_est, t_gt)) > 0.999, (t_est, t_gt)
    # structure correct up to the common scale
    good = np.asarray(good)
    s = np.median(X[good, 2] / np.asarray(X_est)[good, 2])
    rel = np.abs(np.asarray(X_est)[good] * s - X[good]) / z[good, None]
    assert np.median(rel) < 0.01, np.median(rel)


def test_mono_bootstrap_rejects_pure_rotation(rng):
    """No parallax (pure rotation): triangulation is degenerate, cheirality
    census collapses, and the bootstrap must not report success with a
    large confident inlier set."""
    n = 200
    xn = (rng.rand(n) - 0.5) * 1.0
    yn = (rng.rand(n) - 0.5) * 0.7
    z = 4.0 + 8.0 * rng.rand(n)
    X = np.stack([xn * z, yn * z, z], -1).astype(np.float32)
    T_21 = np.asarray(se3.exp(jnp.asarray(
        [0.0, 0.0, 0.0, 0.02, 0.08, -0.01], jnp.float32)))  # rotation only
    p1 = X @ K.T
    px1 = p1[:, :2] / p1[:, 2:3]
    Xc2 = X @ T_21[:3, :3].T
    p2 = Xc2 @ K.T
    px2 = p2[:, :2] / p2[:, 2:3]
    valid = np.ones(n, bool)
    _, X_est, good, ok = epipolar.mono_bootstrap(
        jnp.asarray(K), jnp.asarray(px1, jnp.float32),
        jnp.asarray(px2, jnp.float32), jnp.asarray(valid),
        jax.random.PRNGKey(1))
    # with zero baseline the triangulated depths blow up / census is weak;
    # accept either an explicit failure or garbage depths we can gate on
    z_est = np.asarray(X_est)[np.asarray(good)][:, 2] if bool(ok) else None
    if bool(ok):
        spread = np.percentile(np.abs(z_est), 90) / max(
            np.percentile(np.abs(z_est), 10), 1e-6)
        assert spread > 50 or np.median(np.abs(z_est)) > 1e3


@pytest.mark.slow
def test_mono_vo_tracks_corridor_scale_aligned():
    """Full mono pipeline on the corridor: bootstrap from parallax, then
    tracking with two-view triangulated landmarks. Evaluated with
    scale-aligned ATE (mono scale is a convention)."""
    from trackingbench_slam_tpu.models.mono_vo import MonoVO
    from trackingbench_slam_tpu.utils import metrics
    from trackingbench_slam_tpu.utils.synthetic import (
        CorridorScene, lateral_trajectory)

    cam = CAMC
    # local_ba_every=2 also exercises MONO windowed BA (num_fixed=2 pins
    # the scale gauge; this run is the regression guard for the NaN-step
    # acceptance bug — a non-finite step scored cost 0 under the
    # behind-camera mask and poisoned the map)
    cfg = PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=800, min_threshold=10,
                                  cell_size=24),
        map=MapConfig(max_keyframes=12, max_points=8192),
        keyframe_every=4, local_ba_every=2)
    scene = CorridorScene(cam)
    n = 28
    # sideways motion gives parallax for the bootstrap; gentle yaw after
    gt = lateral_trajectory(n, step=0.06, yaw_amp=0.01)
    vo = MonoVO(cfg, min_parallax_px=20.0)
    for T in gt:
        vo.track(scene.render(T))
    assert vo.initialized, "mono bootstrap never fired"
    P = vo.poses()
    # evaluate only the post-init segment (poses before initialization are
    # placeholders; the mono world is anchored at frame 0)
    assert np.isfinite(P).all()
    k0 = next(i for i in range(1, n) if not np.allclose(P[i], np.eye(4)))
    ate = metrics.ate_rmse(P[k0:], gt[k0:], align=True, with_scale=True)
    assert ate < 0.06, ate
    alive = int(np.asarray(vo.state.map.valid).sum())
    assert alive > 150, alive
    assert np.isfinite(np.asarray(vo.state.map.pos)[
        np.asarray(vo.state.map.valid)]).all()
