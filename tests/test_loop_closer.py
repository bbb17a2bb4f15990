"""Loop-closing pipeline test: out-and-back trajectory over the synthetic
plane; the revisit frame must retrieve the early keyframe, verify
geometrically, and the pose graph must remove injected drift."""

import numpy as np
import pytest
import jax.numpy as jnp

from trackingbench_slam_tpu.bow import vocabulary as bow
from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.models.extractors import extract_orb
from trackingbench_slam_tpu.models.frame import make_frame
from trackingbench_slam_tpu.models.loop_closer import LoopCloser
from trackingbench_slam_tpu.utils.config import (CameraConfig, ExtractorConfig,
                                                 PyramidConfig)
from trackingbench_slam_tpu.utils.synthetic import PlaneSequence

DEPTH = 8.0
CAMC = CameraConfig(width=320, height=240, fx=300.0, fy=300.0,
                    cx=160.0, cy=120.0)


def _out_and_back(n=12, step=0.08):
    poses = []
    for i in range(n):
        # forth for n/2, back for n/2 (ends where it started)
        x = step * (i if i < n // 2 else (n - 1 - i))
        T_wc = np.eye(4)
        T_wc[0, 3] = x
        poses.append(np.linalg.inv(T_wc))
    return np.stack(poses)


@pytest.mark.slow
def test_loop_detected_and_corrected(sparse=False):
    cam = cam_mod.CameraParams.from_config(CAMC)
    ecfg = ExtractorConfig(num_features=384, min_threshold=12, cell_size=16)
    pcfg = PyramidConfig(num_levels=3, scale_factor=0.8)
    seq = PlaneSequence(CAMC, depth=DEPTH)
    gt = _out_and_back()
    n = gt.shape[0]

    frames = []
    descs = []
    for T in gt:
        img = seq.render(T)
        f = make_frame(jnp.asarray(img), 384, 3, 0.8)
        f = extract_orb(f, cam, ecfg, pcfg)
        frames.append(f)
        descs.append(np.asarray(f.desc))
    voc = bow.train(np.concatenate(descs)[:4000], branching=6, depth=3,
                    seed=0)

    closer = LoopCloser(voc, cam, min_score=0.02, min_inliers=25,
                        exclude_recent=4, sparse=sparse)
    # register all but the last frame as keyframes, with exact landmarks
    # (plane backprojection through the true pose)
    for i in range(n - 1):
        f = frames[i]
        kp = np.asarray(f.kp_xy)
        valid = np.asarray(f.valid)
        T_wc = np.linalg.inv(gt[i])
        xn = (kp[:, 0] - CAMC.cx) / CAMC.fx
        yn = (kp[:, 1] - CAMC.cy) / CAMC.fy
        # ray-plane intersection in world frame
        d_w = np.stack([xn, yn, np.ones_like(xn)], -1) @ T_wc[:3, :3].T
        t = (DEPTH - T_wc[2, 3]) / d_w[:, 2]
        pos_w = T_wc[:3, 3] + t[:, None] * d_w
        map_idx = np.where(valid, np.arange(kp.shape[0]), -1)
        closer.add_keyframe(f.desc, f.valid, f.kp_xy, map_idx,
                            pos_w.astype(np.float32), gt[i])

    # the final frame is back at the start: detect against the early KFs
    f = frames[-1]
    loop = closer.detect(f.desc, f.valid, f.kp_xy, jnp.asarray(gt[-1]))
    assert loop is not None
    assert loop.kf_index <= 2, loop.kf_index
    assert loop.num_inliers >= 25
    # relative pose current<-kf should be close to identity-ish translation
    rel_gt = gt[-1] @ np.linalg.inv(gt[loop.kf_index])
    assert np.abs(loop.T_cur_kf[:3, 3] - rel_gt[:3, 3]).max() < 0.02

    # drifted trajectory: inject x drift, let the loop edge fix the endpoint
    drift = gt.copy()
    for k in range(1, n):
        drift[k] = drift[k].copy()
        drift[k][0, 3] += 0.01 * k  # accumulating drift in camera x
    T_opt, cost = LoopCloser.correct_trajectory(
        drift, loop, cur_index=n - 1)
    end_err_before = np.abs(drift[n - 1][0, 3] - gt[n - 1][0, 3])
    end_err_after = np.abs(T_opt[n - 1][0, 3] - gt[n - 1][0, 3])
    assert end_err_after < end_err_before * 0.5, (end_err_before,
                                                 end_err_after)


def test_loop_detected_sparse_db():
    """The sparse-vector database path (auto-selected at ORBvoc scale,
    forced here) must detect and verify the same loop."""
    test_loop_detected_and_corrected(sparse=True)


def test_entry_ring_wraps_with_database():
    """After the database ring wraps, a returned index must name the entry
    that produced the stored vector — the round-2 stale-index hazard
    (LoopCloser.entries grew unbounded while BowDatabase wrapped at its
    capacity)."""
    cam = cam_mod.CameraParams.from_config(CAMC)
    rng = np.random.RandomState(3)
    descs = rng.randint(0, 2 ** 32, size=(10, 16, 8), dtype=np.uint64)
    descs = descs.astype(np.uint32)
    voc = bow.train(descs.reshape(-1, 8), branching=4, depth=3, seed=1)

    closer = LoopCloser(voc, cam, capacity=4, exclude_recent=1)
    valid = jnp.ones((16,), bool)
    kp = jnp.zeros((16, 2), jnp.float32)
    midx = np.full((16,), -1, np.int32)
    pos = np.zeros((1, 3), np.float32)
    slots = []
    for i in range(7):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(i)  # tag each entry by its pose
        slots.append(closer.add_keyframe(jnp.asarray(descs[i]), valid, kp,
                                         midx, pos, T))
    # 7 adds into a 4-ring: slots cycle 0,1,2,3,0,1,2
    assert slots == [0, 1, 2, 3, 0, 1, 2]
    assert closer.num_entries == 4
    # slot 0 must now describe keyframe 4, not keyframe 0
    assert closer.entries[0]["T_cw"][0, 3] == 4.0
    # and the database vector at slot 0 must be keyframe 4's vector
    words, _ = bow.transform(voc, jnp.asarray(descs[4]), valid)
    v4 = bow.bow_vector(voc, words, valid)
    assert np.allclose(np.asarray(closer.db.vectors[0]), np.asarray(v4))
