"""Offline (scan-fused) stereo VO must reproduce the live per-frame loop:
same step functions, same cadence, one device program for the whole
sequence (models/offline.py)."""

import numpy as np
import pytest

from trackingbench_slam_tpu.models.offline import (OfflineStereoVO,
                                                   sequence_schedule)
from trackingbench_slam_tpu.models.vo import StereoVO
from trackingbench_slam_tpu.utils import metrics
from trackingbench_slam_tpu.utils.config import (CameraConfig,
                                                 ExtractorConfig, MapConfig,
                                                 PipelineConfig,
                                                 PyramidConfig, SolverConfig)
from trackingbench_slam_tpu.utils.synthetic import (PlaneSequence,

                                                    lateral_trajectory)

pytestmark = pytest.mark.slow  # minutes-long e2e on CPU

BASELINE_M = 0.2


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
        local_ba_every=2,
    )


def test_schedule_matches_live_cadence():
    cfg = small_config()
    is_kf, right_idx, do_ba = sequence_schedule(cfg, 16)
    # live loop: fid = i + 1, keyframe at fid % 5 == 0 -> frames 4, 9, 14
    assert list(np.nonzero(is_kf)[0] + 1) == [4, 9, 14]
    # right image 0 went to the bootstrap keyframe
    assert [right_idx[t - 1] for t in (4, 9, 14)] == [1, 2, 3]
    # BA at every 2nd keyframe -> frame 9 only
    assert list(np.nonzero(do_ba)[0] + 1) == [9]


def test_offline_matches_live_loop():
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=8.0)
    gt = lateral_trajectory(16, step=0.03)
    frames = []
    for i, T in enumerate(gt):
        need_r = i == 0 or (i + 1) % cfg.keyframe_every == 0
        L, R = seq.stereo_pair(T, BASELINE_M)
        frames.append((L, R if need_r else None))

    live = StereoVO(cfg)
    for L, R in frames:
        live.track(L, R)
    p_live = live.poses()

    off = OfflineStereoVO(cfg)
    res = off.run(frames)
    p_off = off.poses()

    assert p_off.shape == p_live.shape
    # same math, same cadence — trajectories agree to float tolerance
    np.testing.assert_allclose(p_off, p_live, atol=1e-4)
    ate = metrics.ate_rmse(p_off, gt, align=True)
    assert ate < 0.02, ate
    assert int(np.asarray(res.num_inliers)[-1]) > 50


def test_offline_dense_rights_match_sparse_rights():
    """Datasets where EVERY frame carries a right image (recorded stereo,
    e.g. KITTI) must produce the same trajectory as the cadence-only-rights
    form: prepare() stacks only the rights the schedule consumes, so
    right_idx cannot shift onto the wrong image (the r3 advisor's
    high-severity finding: with dense rights, keyframes stereo-matched
    against earlier frames' rights)."""
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=8.0)
    gt = lateral_trajectory(12, step=0.03)
    pairs = [seq.stereo_pair(T, BASELINE_M) for T in gt]
    dense = [(L, R) for L, R in pairs]
    sparse = [(L, R if (i == 0 or (i + 1) % cfg.keyframe_every == 0)
               else None) for i, (L, R) in enumerate(pairs)]

    vo_d = OfflineStereoVO(cfg)
    vo_d.run(dense)
    vo_s = OfflineStereoVO(cfg)
    vo_s.run(sparse)
    np.testing.assert_allclose(vo_d.poses(), vo_s.poses(), atol=1e-5)
