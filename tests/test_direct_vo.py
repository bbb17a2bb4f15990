"""Direct (SVO-style) VO pipeline end-to-end on the synthetic plane."""

import numpy as np
import pytest

from trackingbench_slam_tpu.models.direct_vo import DirectVO
from trackingbench_slam_tpu.utils import metrics
from tests.test_vo import small_config, BASELINE_M, DEPTH
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence, lateral_trajectory


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
