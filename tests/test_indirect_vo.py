"""Indirect (extract+match every frame) VO end-to-end — the test_vo_1
equivalent — across matching strategies."""

import numpy as np
import pytest

from trackingbench_slam_tpu.models.indirect_vo import IndirectVO, MatchStrategy
from trackingbench_slam_tpu.utils import metrics
from tests.test_vo import small_config, BASELINE_M, DEPTH
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence, lateral_trajectory


@pytest.fixture(scope="module")
def sequence():
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=DEPTH)
    gt = lateral_trajectory(10, step=0.03)
    frames = [seq.stereo_pair(T, BASELINE_M) for T in gt]
    return cfg, gt, frames


@pytest.mark.parametrize("strategy", [MatchStrategy.NN, MatchStrategy.BF,
                                      MatchStrategy.WINDOW,
                                      MatchStrategy.PROJECTION])
def test_indirect_vo_tracks(sequence, strategy):
    """The full strategy matrix (VERDICT item 10): every interchangeable
    frame-matching strategy must carry the same e2e pipeline to the same
    tracking quality — the 'drop-in interchangeable' claim of
    test_vo.cpp:211-213, demonstrated rather than just compiled."""
    cfg, gt, frames = sequence
    vo = IndirectVO(cfg, strategy)
    for (L, R) in frames:
        vo.track(L, R)
    poses = vo.poses()
    ate = metrics.ate_rmse(poses, gt, align=True)
    assert int(vo.state.num_inliers) > 30, int(vo.state.num_inliers)
    assert ate < 0.04, (strategy, ate)


def test_indirect_vo_on_rotating_depth_scene():
    """One strategy on the non-degenerate corridor (rotation + depth
    variation), so the indirect pipeline's accuracy claim doesn't rest on
    the fronto-parallel plane."""
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig)
    from trackingbench_slam_tpu.utils.synthetic import (
        CorridorScene, forward_yaw_trajectory)
    cam = CameraConfig(width=512, height=384, fx=400, fy=400, cx=256,
                       cy=192, bf=400 * 0.3)
    cfg = PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=600, min_threshold=10,
                                  cell_size=24),
        map=MapConfig(max_keyframes=12, max_points=8192),
        keyframe_every=1, local_ba_every=0)
    scene = CorridorScene(cam)
    gt = forward_yaw_trajectory(10, step=0.08, yaw_rate=0.012)
    vo = IndirectVO(cfg, MatchStrategy.NN)
    inliers = []
    for T in gt:
        L, R = scene.stereo_pair(T, 0.3)
        vo.track(L, R)
        inliers.append(int(vo.state.num_inliers))
    ate = metrics.ate_rmse(vo.poses(), gt, align=True)
    # the NN accept rule dist < min(10*global_min, 30) (matcher.cpp:79-85)
    # makes the per-frame inlier count swing with the global min distance;
    # gate the peak and the trajectory quality, not one frame's count
    assert max(inliers[1:]) > 100, inliers
    assert min(inliers[1:]) > 20, inliers
    assert ate < 0.02, ate
