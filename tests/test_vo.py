"""End-to-end stereo VO on a rendered synthetic sequence with exact ground
truth — the hermetic equivalent of the reference's test_kitti loop
(test/test_vo.cpp:613-862)."""

import numpy as np
import pytest
import jax.numpy as jnp

from trackingbench_slam_tpu.models.vo import StereoVO
from trackingbench_slam_tpu.utils import metrics
from trackingbench_slam_tpu.utils.config import (CameraConfig, ExtractorConfig,
                                                 MapConfig, MatcherConfig,
                                                 PipelineConfig, PyramidConfig,
                                                 SolverConfig)
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence, lateral_trajectory

pytestmark = pytest.mark.slow  # minutes-long e2e on CPU

BASELINE_M = 0.2
DEPTH = 8.0


def small_config():
    cam = CameraConfig(width=320, height=240, fx=300.0, fy=300.0,
                       cx=160.0, cy=120.0, bf=300.0 * BASELINE_M)
    return PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=512, min_threshold=12,
                                  cell_size=16),
        solver=SolverConfig(),
        map=MapConfig(max_keyframes=8, max_points=4096),
        keyframe_every=5,
    )


@pytest.fixture(scope="module")
def sequence():
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=DEPTH)
    gt = lateral_trajectory(16, step=0.03)
    frames = [seq.stereo_pair(T, BASELINE_M) for T in gt]
    return cfg, gt, frames


def test_stereo_vo_tracks_sequence(sequence):
    cfg, gt, frames = sequence
    vo = StereoVO(cfg)
    for (L, R) in frames:
        vo.track(L, R)
    poses = vo.poses()
    assert poses.shape == (len(frames), 4, 4)
    # inliers survived tracking on the last frame
    assert int(vo.state.num_inliers) > 50, int(vo.state.num_inliers)
    ate = metrics.ate_rmse(poses, gt, align=True)
    # camera moves ~0.45m total; ATE must be way under a baseline
    assert ate < 0.02, ate
    # unaligned drift sanity: final position error
    p_est = metrics.trajectory_positions(poses)
    p_gt = metrics.trajectory_positions(gt)
    final_err = np.linalg.norm(p_est[-1] - p_gt[-1])
    assert final_err < 0.05, final_err


def test_map_grows_with_keyframes(sequence):
    cfg, gt, frames = sequence
    vo = StereoVO(cfg)
    for (L, R) in frames[:6]:
        vo.track(L, R)
    n_pts = int(vo.state.map.num_valid())
    n_kfs = int(jnp.sum(vo.state.kfs.valid))
    assert n_pts > 100, n_pts
    assert n_kfs >= 2, n_kfs
    # landmarks observed by keyframes carry observations
    obs = np.asarray(vo.state.map.obs_count)
    valid = np.asarray(vo.state.map.valid)
    assert (obs[valid] > 0).mean() > 0.9


def test_depth_accuracy_via_stereo(sequence):
    """Stereo-created landmarks should sit on the plane (exact depth known) —
    the quantitative version of the reference's disparity-oracle check
    (test_vo.cpp:456-483)."""
    cfg, gt, frames = sequence
    vo = StereoVO(cfg)
    vo.track(*frames[0])
    m = vo.state.map
    valid = np.asarray(m.valid)
    pos = np.asarray(m.pos)[valid]
    # world frame == first camera frame (identity first pose): plane z=DEPTH
    err = np.abs(pos[:, 2] - DEPTH)
    assert np.median(err) < 0.1, np.median(err)
    assert (err < 0.5).mean() > 0.9
