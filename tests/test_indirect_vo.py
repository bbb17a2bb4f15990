"""Indirect (extract+match every frame) VO end-to-end — the test_vo_1
equivalent — across matching strategies."""

import numpy as np
import pytest

from trackingbench_slam_tpu.models.indirect_vo import IndirectVO, MatchStrategy
from trackingbench_slam_tpu.utils import metrics
from tests.test_vo import small_config, BASELINE_M, DEPTH
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence, lateral_trajectory


pytestmark = pytest.mark.slow  # minutes-long e2e on CPU

@pytest.fixture(scope="module")
def sequence():
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=DEPTH)
    gt = lateral_trajectory(10, step=0.03)
    frames = [seq.stereo_pair(T, BASELINE_M) for T in gt]
    return cfg, gt, frames


@pytest.fixture(scope="module")
def scene_voc(sequence):
    """Small vocabulary trained on the scene's own descriptors (the
    reference loads ORBvoc.txt from an absolute path it doesn't ship,
    test_vo.cpp:661-666; we train from the target domain instead)."""
    import jax.numpy as jnp
    from trackingbench_slam_tpu.bow import vocabulary as bow
    from trackingbench_slam_tpu.geometry import camera as cam_mod
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import make_frame
    cfg, gt, frames = sequence
    cam = cam_mod.CameraParams.from_config(cfg.camera)
    descs = []
    for L, _ in frames[::3]:
        f = make_frame(jnp.asarray(L), cfg.extractor.num_features,
                       cfg.pyramid.num_levels, cfg.pyramid.scale_factor)
        f = extract_orb(f, cam, cfg.extractor, cfg.pyramid)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    return bow.train(np.concatenate(descs)[:4000], branching=6, depth=3,
                     seed=0)


@pytest.mark.parametrize("strategy", [MatchStrategy.NN, MatchStrategy.BF,
                                      MatchStrategy.WINDOW,
                                      MatchStrategy.PROJECTION,
                                      MatchStrategy.BOW])
def test_indirect_vo_tracks(sequence, scene_voc, strategy):
    """The full strategy matrix (VERDICT item 10): every interchangeable
    frame-matching strategy must carry the same e2e pipeline to the same
    tracking quality — the 'drop-in interchangeable' claim of
    test_vo.cpp:211-213, demonstrated rather than just compiled. BOW
    completes the seventh-of-seven (searchByBow as a frame-to-frame
    strategy, matcher.cpp:619-721)."""
    cfg, gt, frames = sequence
    vo = IndirectVO(cfg, strategy,
                    voc=scene_voc if strategy is MatchStrategy.BOW else None)
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
