"""Offline (recorded-sequence) stereo VO: the whole sequence as ONE device
program.

The live StereoVO loop issues one host->device dispatch per frame (plus
uploads); that is the right shape for a latency-critical tracker on a
locally attached chip, but every dispatch over a remote transport costs a
~15-25 ms round trip, and a *benchmark workbench* — which is what the
reference is (README.md:1-4: "Visual feature tracking benchmarks") — spends
most of its life re-running recorded sequences. This module is the
TPU-idiomatic shape for that job: upload the stacked frames once, then
`lax.scan` the SAME jitted step functions (track_step /
track_and_keyframe_step / local_ba_step — no forked math) over the frame
axis, with the keyframe/BA cadence precomputed as per-step flags. The
entire sequence runs as one XLA program: zero per-frame dispatches, zero
host round-trips, and the per-frame trajectory comes back as one (T, 4, 4)
fetch.

Semantics are identical to the live loop by construction — the scan body
calls the very same step functions in the same order with the same cadence
(tests/test_offline.py asserts the trajectories match). Loop closing and
relocalization are host-verdict stages and stay with the live loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.models import vo as vo_mod
from trackingbench_slam_tpu.models.local_mapping import local_ba_step
from trackingbench_slam_tpu.utils.config import PipelineConfig


class OfflineResult(NamedTuple):
    # The scan covers frames 1..T-1; frame 0 (the bootstrap keyframe) is
    # prepended by OfflineStereoVO.poses(), not present here.
    T_cw: jax.Array          # (T-1, 4, 4) world->camera poses, frames 1..T-1
    num_inliers: jax.Array   # (T-1,) post-optimization inlier counts
    state: vo_mod.VOState    # final pipeline state (map, keyframe ring, ...)


def sequence_schedule(cfg: PipelineConfig, n_frames: int):
    """The live loop's cadence as static per-frame flags (frames 1..T-1;
    frame 0 is the bootstrap keyframe handled outside the scan).

    Mirrors StereoVO.track exactly: frame i has host counter fid = i + 1,
    keyframes fire at fid % keyframe_every == 0, local BA at every
    `local_ba_every`-th keyframe (test_vo.cpp:772 cadence + the local
    mapping stage)."""
    is_kf, right_idx, do_ba = [], [], []
    kf_count = 0
    r = 1  # right image 0 fed the bootstrap keyframe
    for i in range(1, n_frames):
        fid = i + 1
        kf = fid % cfg.keyframe_every == 0
        is_kf.append(kf)
        right_idx.append(r if kf else 0)
        if kf:
            r += 1
            kf_count += 1
            do_ba.append(cfg.local_ba_every > 0
                         and kf_count % cfg.local_ba_every == 0)
        else:
            do_ba.append(False)
    return (np.asarray(is_kf), np.asarray(right_idx, np.int32),
            np.asarray(do_ba))


@functools.partial(jax.jit, static_argnames=("cfg",))
def offline_run(state: vo_mod.VOState, lefts: jax.Array, rights: jax.Array,
                is_kf: jax.Array, right_idx: jax.Array, do_ba: jax.Array,
                cam: cam_mod.CameraParams,
                cfg: PipelineConfig) -> OfflineResult:
    """Scan the per-frame step over frames 1..T-1 (state must already hold
    the bootstrapped frame 0). lefts: (T-1, H, W); rights: (R, H, W) with
    right_idx[t] selecting the keyframe-cadence right image."""

    def body(st, inp):
        left, kf, ridx, ba = inp

        def kf_branch(s):
            right = jax.lax.dynamic_index_in_dim(rights, ridx, axis=0,
                                                 keepdims=False)
            s = vo_mod.track_and_keyframe_step(s, left, right, cam, cfg)
            return jax.lax.cond(ba, lambda x: local_ba_step(x, cam, cfg),
                                lambda x: x, s)

        st = jax.lax.cond(kf, kf_branch,
                          lambda s: vo_mod.track_step(s, left, cam, cfg), st)
        return st, (st.T_cw, st.num_inliers)

    final, (T_traj, inl) = jax.lax.scan(
        body, state, (lefts, is_kf, right_idx, do_ba))
    return OfflineResult(T_cw=T_traj, num_inliers=inl, state=final)


def refine_trajectory(T_traj: np.ndarray, kfs) -> np.ndarray:
    """Re-express each frame's pose relative to its reference keyframe's
    FINAL (local-BA-corrected) ring pose. The one shared implementation —
    StereoVO.poses (models/vo.py) delegates here."""
    T = np.asarray(T_traj)
    fid = np.asarray(kfs.frame_id)
    valid = np.asarray(kfs.valid)
    Tkf = np.asarray(kfs.T_cw)
    final = {max(int(fid[s]) - 1, 0): Tkf[s]
             for s in range(len(fid)) if valid[s]}
    out = T.copy()
    ref = None
    for i in range(T.shape[0]):
        if i in final:
            ref = i
            out[i] = final[i]
        elif ref is not None:
            out[i] = (T[i] @ np.linalg.inv(T[ref])) @ final[ref]
    return out


class OfflineStereoVO:
    """Host driver for recorded sequences: one upload, one dispatch, one
    trajectory fetch.

    >>> vo = OfflineStereoVO(cfg)
    >>> result = vo.run(frames)        # [(left, right-or-None), ...]
    >>> poses = vo.poses()             # (T, 4, 4), BA-refined
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.cam = cam_mod.CameraParams.from_config(cfg.camera)
        self.result: OfflineResult | None = None
        self._T0 = None

    def prepare(self, frames):
        """Upload the stacked sequence (split out from run() so benchmarks
        can time compute separately from the one-time transfer)."""
        cfg = self.cfg
        n = len(frames)
        is_kf, right_idx, do_ba = sequence_schedule(cfg, n)
        # Stack ONLY the rights the schedule consumes: frame 0 (bootstrap)
        # plus each scan keyframe, in schedule order. Datasets where every
        # frame carries a right image (KITTI/EuRoC recordings) would
        # otherwise shift right_idx and stereo-match keyframes against the
        # wrong right image.
        assert frames[0][1] is not None, "frame 0 bootstraps stereo"
        rights_np = [np.asarray(frames[0][1])]
        for t in range(1, n):
            if is_kf[t - 1]:
                assert frames[t][1] is not None, f"keyframe {t} has no right"
                rights_np.append(np.asarray(frames[t][1]))
        lefts = jax.device_put(
            jnp.asarray(np.stack([np.asarray(L) for L, _ in frames[1:]])))
        rights = jax.device_put(jnp.asarray(np.stack(rights_np)))
        first = jnp.asarray(np.asarray(frames[0][0]))
        return (lefts, rights, jnp.asarray(is_kf),
                jnp.asarray(right_idx), jnp.asarray(do_ba), first)

    def run(self, frames=None, prepared=None) -> OfflineResult:
        if prepared is None:
            prepared = self.prepare(frames)
        lefts, rights, is_kf, right_idx, do_ba, first = prepared
        cfg = self.cfg
        state = vo_mod.init_state(cfg, first)
        state = vo_mod.keyframe_step(
            state, jax.lax.dynamic_index_in_dim(rights, 0, axis=0,
                                                keepdims=False),
            self.cam, cfg)
        state = state._replace(frame_id=state.frame_id + 1)
        self._T0 = state.T_cw
        self.result = offline_run(state, lefts, rights, is_kf, right_idx,
                                  do_ba, self.cam, cfg)
        return self.result

    def poses(self, refine_with_keyframes: bool = True) -> np.ndarray:
        T = np.concatenate([np.asarray(self._T0)[None],
                            np.asarray(self.result.T_cw)], axis=0)
        if not refine_with_keyframes:
            return T
        return refine_trajectory(T, self.result.state.kfs)
