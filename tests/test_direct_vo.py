"""Direct (SVO-style) VO pipeline end-to-end on the synthetic plane."""

import numpy as np
import pytest

from trackingbench_slam_tpu.models.direct_vo import DirectVO
from trackingbench_slam_tpu.utils import metrics
from tests.test_vo import small_config, BASELINE_M, DEPTH
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence, lateral_trajectory


pytestmark = pytest.mark.slow  # minutes-long e2e on CPU

def test_direct_vo_tracks_sequence():
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=DEPTH)
    gt = lateral_trajectory(10, step=0.02)
    frames = [seq.stereo_pair(T, BASELINE_M) for T in gt]
    vo = DirectVO(cfg)
    for (L, R) in frames:
        vo.track(L, R)
    poses = vo.poses()
    assert vo.num_tracked > 40, vo.num_tracked
    ate = metrics.ate_rmse(poses, gt, align=True)
    assert ate < 0.03, ate
    p_est = metrics.trajectory_positions(poses)
    p_gt = metrics.trajectory_positions(gt)
    final_err = np.linalg.norm(p_est[-1] - p_gt[-1])
    assert final_err < 0.06, final_err


def test_direct_vo_corridor_ate_and_seed_promotion():
    """Quantitative e2e gate on the NON-degenerate corridor (depth 4-40 m,
    forward motion + yaw): ATE bound AND a seed-promotion-rate assertion —
    stereo only at bootstrap, so every later landmark must come from the
    Vogiatzis depth filter converging (the reference's DepthFilter is an
    empty stub, include/mapping/DepthFilter.h:6-12; SVO semantics)."""
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig)
    from trackingbench_slam_tpu.utils.synthetic import (
        CorridorScene, forward_yaw_trajectory)
    cam = CameraConfig(width=512, height=384, fx=400, fy=400, cx=256,
                       cy=192, bf=400 * 0.3)
    cfg = PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=4, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=600, min_threshold=10,
                                  cell_size=24),
        map=MapConfig(max_keyframes=12, max_points=8192),
        keyframe_every=4, local_ba_every=0)
    scene = CorridorScene(cam)
    n = 24
    gt = forward_yaw_trajectory(n, step=0.05, yaw_rate=0.006)
    vo = DirectVO(cfg)
    for i, T in enumerate(gt):
        if i == 0:
            L, R = scene.stereo_pair(T, 0.3)
            vo.track(L, R)
        else:
            vo.track(scene.render(T))  # mono from here: filter must carry
    assert vo.num_tracked > 40, vo.num_tracked
    # the depth filter must be promoting converged seeds into landmarks
    assert vo.num_promoted > 50, vo.num_promoted
    ate = metrics.ate_rmse(vo.poses(), gt, align=True)
    assert ate < 0.05, ate  # < 5 cm over a ~1.2 m run with mono keyframes
