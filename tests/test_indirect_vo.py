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
                                      MatchStrategy.WINDOW])
def test_indirect_vo_tracks(sequence, strategy):
    cfg, gt, frames = sequence
    vo = IndirectVO(cfg, strategy)
    for (L, R) in frames:
        vo.track(L, R)
    poses = vo.poses()
    ate = metrics.ate_rmse(poses, gt, align=True)
    assert int(vo.state.num_inliers) > 30, int(vo.state.num_inliers)
    assert ate < 0.04, (strategy, ate)
