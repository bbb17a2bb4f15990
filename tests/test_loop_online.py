"""Online loop closure + relocalization through the LIVE StereoVO loop —
the integration round 1 left on the bench (VERDICT items 3/26: the pipeline
never populated the BoW database, so neither loop correction nor
relocalization could ever fire)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.bow import vocabulary as bow
from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.models.loop_closer import LoopCloser
from trackingbench_slam_tpu.models.vo import StereoVO
from trackingbench_slam_tpu.utils.config import (
    CameraConfig, ExtractorConfig, MapConfig, PipelineConfig, PyramidConfig)
from trackingbench_slam_tpu.utils.synthetic import (
    CorridorScene, forward_yaw_trajectory, loop_trajectory)

pytestmark = pytest.mark.slow  # minutes-long e2e on CPU

BASELINE = 0.25
CAM = CameraConfig(width=512, height=384, fx=400, fy=400, cx=256, cy=192,
                   bf=400 * BASELINE)


def _cfg(keyframe_every=3, local_ba_every=0):
    return PipelineConfig(
        camera=CAM,
        pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=600, min_threshold=10,
                                  cell_size=24),
        map=MapConfig(max_keyframes=16, max_points=8192),
        keyframe_every=keyframe_every,
        local_ba_every=local_ba_every,
        # rotation-heavy circle: 3 LK levels cover the gentle opening
        # frames; the SE3 motion model carries the fast mid-loop turn
        lk_track_levels=3)


def _train_voc(scene, poses, cfg):
    """Small vocabulary from descriptors of a few scene views."""
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import make_frame
    cam = cam_mod.CameraParams.from_config(cfg.camera)
    descs = []
    for T in poses[::4]:
        f = make_frame(jnp.asarray(scene.render(T), jnp.float32), 600,
                       cfg.pyramid.num_levels, cfg.pyramid.scale_factor)
        f = extract_orb(f, cam, cfg.extractor, cfg.pyramid)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    return bow.train(np.concatenate(descs)[:4000], branching=6, depth=3,
                     seed=0)


@pytest.fixture(scope="module")
def scene():
    return CorridorScene(CAM, width=8.0, height=5.0)


def test_online_loop_closure_fires_and_corrects(scene):
    """Drive a closed circle; the returning keyframes must retrieve the
    early ones from the database built ONLINE, and the pose-graph correction
    must leave the closing error no worse (and fix most of any drift)."""
    n = 48
    gt = loop_trajectory(n, radius=1.0)
    cfg = _cfg(keyframe_every=3)
    voc = _train_voc(scene, gt, cfg)
    cam = cam_mod.CameraParams.from_config(cfg.camera)

    vo = StereoVO(cfg)
    vo.loop_closer = LoopCloser(voc, cam, min_score=0.015, min_inliers=40,
                                exclude_recent=5)
    for i, T in enumerate(gt):
        need_right = (i == 0 or (i + 1) % cfg.keyframe_every == 0)
        if need_right:
            L, R = scene.stereo_pair(T, BASELINE)
            vo.track(L, R)
        else:
            vo.track(scene.render(T))

    assert vo.loop_closer.num_entries >= 10  # database populated online
    # poses() flushes the final keyframe's deferred loop verdict (detection
    # is asynchronous: the query is issued at the keyframe, the verdict
    # fetched one frame later — a sequence ending ON a keyframe leaves one
    # pending, exactly like the last frame of an offline run)
    P = vo.poses()
    assert len(vo.loop_events) >= 1, "no loop detected on a closed circle"
    # closing error of the corrected trajectory. The VO's world frame is
    # anchored at its first camera; re-express in the GT world by
    # right-multiplying gt[0] before comparing absolute positions.
    c_est = np.linalg.inv(P[-1] @ gt[0])[:3, 3]
    c_gt = np.linalg.inv(gt[-1])[:3, 3]
    err = np.linalg.norm(c_est - c_gt)
    assert err < 0.08, err  # < 8 cm closing error on a ~6.3 m loop


def test_relocalization_fires_after_induced_loss(scene):
    """Blind the camera (black frames) to force tracking loss, then return
    to a previously-seen view: relocalization must fire from the online
    database and recover a pose near ground truth."""
    n = 18
    gt = forward_yaw_trajectory(n, step=0.10, yaw_rate=0.01)
    cfg = _cfg(keyframe_every=2)
    voc = _train_voc(scene, gt, cfg)
    cam = cam_mod.CameraParams.from_config(cfg.camera)

    vo = StereoVO(cfg)
    vo.loop_closer = LoopCloser(voc, cam, min_score=0.015, min_inliers=40,
                                exclude_recent=2)
    vo.min_track_inliers = 15
    for i, T in enumerate(gt):
        need_right = (i == 0 or (i + 1) % cfg.keyframe_every == 0)
        if need_right:
            L, R = scene.stereo_pair(T, BASELINE)
            vo.track(L, R)
        else:
            vo.track(scene.render(T))
    assert vo.loop_closer.num_entries >= 8

    # blind the camera: tracking must be flagged lost
    black = np.zeros((CAM.height, CAM.width), np.float32)
    for _ in range(3):
        vo.track(black)
    # return to the view of a mid-sequence pose
    revisit = gt[8]
    for _ in range(3):  # loss flag lags one frame by design; give it slack
        vo.track(scene.render(revisit))
        if vo.reloc_events:
            break
    assert vo.reloc_events, "relocalization never fired"
    # anchor the VO world (first camera) into the GT world via gt[0]
    T_est = np.asarray(vo.state.T_cw) @ gt[0]
    c_est = np.linalg.inv(T_est)[:3, 3]
    c_gt = np.linalg.inv(revisit)[:3, 3]
    assert np.linalg.norm(c_est - c_gt) < 0.05, (c_est, c_gt)
