"""Auxiliary subsystems: checkpoint/resume, viewer, profiling, datasets."""

import glob
import os

import numpy as np
import pytest
import jax.numpy as jnp

from trackingbench_slam_tpu.models.vo import StereoVO, init_state
from trackingbench_slam_tpu.utils import checkpoint as ckpt
from trackingbench_slam_tpu.utils import metrics
from trackingbench_slam_tpu.utils.profiling import StageTimer, fence
from trackingbench_slam_tpu.viewer.viewer import Viewer
from tests.test_vo import small_config, BASELINE_M, DEPTH
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence, lateral_trajectory


def _short_seq(n=8):
    cfg = small_config()
    seq = PlaneSequence(cfg.camera, depth=DEPTH)
    gt = lateral_trajectory(n, step=0.03)
    frames = [seq.stereo_pair(T, BASELINE_M) for T in gt]
    return cfg, gt, frames


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg, gt, frames = _short_seq(6)
    vo = StereoVO(cfg)
    for (L, R) in frames[:4]:
        vo.track(L, R)
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, vo.state, cfg, vo.trajectory, step=4)

    template = init_state(cfg, jnp.asarray(frames[0][0]))
    state2, cfg2, traj2, step = ckpt.load_checkpoint(path, template)
    assert step == 4
    assert cfg2.camera.fx == cfg.camera.fx
    np.testing.assert_allclose(np.asarray(state2.T_cw),
                               np.asarray(vo.state.T_cw), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state2.map.valid),
                                  np.asarray(vo.state.map.valid))

    # resume tracking from the restored state: must keep working
    vo2 = StereoVO(cfg)
    vo2.state = state2
    vo2.trajectory = [jnp.asarray(t) for t in traj2]
    for (L, R) in frames[4:]:
        vo2.track(L, R)
    ate = metrics.ate_rmse(vo2.poses(), gt, align=True)
    assert ate < 0.02, ate


def test_viewer_renders_frames(tmp_path):
    out = str(tmp_path / "viz")
    v = Viewer(out_dir=out, every=2)
    v.run()
    rng = np.random.RandomState(0)
    pts = rng.rand(100, 3) * 5
    for i in range(6):
        T = np.eye(4)
        T[0, 3] = -0.1 * i
        v.set_map_points(pts)
        v.set_camera_pose(T)
    v.stop()
    files = glob.glob(os.path.join(out, "frame_*.png"))
    assert len(files) >= 2, files


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((64, 64))
    with t.time("op", result_tree=x):
        y = x * 2
    rep = t.report()
    assert "op" in rep
    fence(y)


def test_synthetic_kitti_loader(tmp_path):
    from trackingbench_slam_tpu.utils.datasets import (
        load_kitti_odometry, save_synthetic_kitti)
    root = str(tmp_path / "kitti")
    seq = save_synthetic_kitti(root, n_frames=4, width=320, height=240,
                               baseline=0.2)
    assert len(seq) == 4
    assert seq.gt_T_cw is not None and seq.gt_T_cw.shape == (4, 4, 4)
    L, R = next(iter(seq))
    assert L.shape == (240, 320) and R.shape == (240, 320)
    assert seq.left.native  # decoded through the C++ loader (npy path)
    # poses roundtrip: world->camera
    np.testing.assert_allclose(seq.gt_T_cw[0], np.eye(4), atol=1e-6)
