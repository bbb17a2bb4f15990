"""Data-parallel multi-sequence tracking over the 'dp' mesh axis
(parallel/dp_eval.py): 8 independent sequences stepped as ONE vmapped
program on an 8-device mesh must produce the same trajectories as 8 serial
single-device runs. Makes 'dp' a load-bearing axis (VERDICT r2 #9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.models import vo as vo_mod
from trackingbench_slam_tpu.parallel import dp_eval
from trackingbench_slam_tpu.parallel.mesh import make_mesh
from trackingbench_slam_tpu.utils.config import (
    CameraConfig, ExtractorConfig, MapConfig, PipelineConfig, PyramidConfig)
from trackingbench_slam_tpu.utils.synthetic import (PlaneSequence,
                                                    lateral_trajectory)

B = 8


@pytest.mark.skipif(len(jax.devices()) < B, reason="needs 8 devices")
@pytest.mark.slow
def test_dp_batched_tracking_matches_serial():
    camc = CameraConfig(width=256, height=192, fx=220, fy=220, cx=128,
                        cy=96, bf=220 * 0.25)
    cfg = PipelineConfig(
        camera=camc,
        pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=256, min_threshold=10,
                                  cell_size=20),
        map=MapConfig(max_keyframes=4, max_points=2048),
        keyframe_every=10, local_ba_every=0)
    cam = cam_mod.CameraParams.from_config(camc)
    scene = PlaneSequence(camc, depth=6.0)

    # B sequences: same scene, per-sequence step sizes (distinct content)
    n_frames = 4
    seqs = []
    for b in range(B):
        gt = lateral_trajectory(n_frames + 1, step=0.01 + 0.004 * b)
        seqs.append([scene.stereo_pair(T, 0.25) for T in gt])

    # bootstrap each sequence (frame 0 keyframe) serially
    states = []
    for b in range(B):
        L0, R0 = seqs[b][0]
        st = vo_mod.init_state(cfg, jnp.asarray(L0, jnp.float32))
        st = vo_mod.keyframe_step(st, jnp.asarray(R0, jnp.float32), cam, cfg)
        st = st._replace(frame_id=st.frame_id + 1)
        states.append(st)

    # serial reference: track each sequence alone
    serial_poses = []
    for b in range(B):
        st = states[b]
        for i in range(1, n_frames + 1):
            st = vo_mod.track_step(st, jnp.asarray(seqs[b][i][0],
                                                   jnp.float32), cam, cfg)
        serial_poses.append(np.asarray(st.T_cw))

    # batched: one vmapped program over the dp=8 mesh
    mesh = make_mesh(lm=1, dp=B)
    batched = dp_eval.stack_states(states)
    batched = dp_eval.shard_batch(mesh, batched)
    for i in range(1, n_frames + 1):
        imgs = jnp.stack([jnp.asarray(seqs[b][i][0], jnp.float32)
                          for b in range(B)])
        imgs = dp_eval.shard_batch(mesh, imgs)
        batched = dp_eval.dp_track_step(batched, imgs, cam, cfg)

    # the batch axis is genuinely sharded over 'dp' (each device holds ONE
    # sequence's pose, not a replicated copy of all eight)
    shards = batched.T_cw.addressable_shards
    assert len(shards) == B, len(shards)
    assert shards[0].data.shape[0] == 1, shards[0].data.shape

    T_b = np.asarray(batched.T_cw)
    for b in range(B):
        # same math, same program per sequence -> near-bitwise trajectories
        assert np.allclose(T_b[b], serial_poses[b], atol=1e-5), (
            b, T_b[b] - serial_poses[b])
    # sequences genuinely differ (the batch is not degenerate)
    assert not np.allclose(serial_poses[0], serial_poses[-1], atol=1e-4)
