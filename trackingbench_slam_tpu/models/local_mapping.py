"""Local mapping: windowed bundle adjustment as a LIVE pipeline stage.

The reference's g2o dependency exists to serve exactly this role
(BlockSolver_6_3 is the pose/landmark Schur structure,
src/mapping/LocalBA.cpp:293-304), but its live loop only ever runs
motion-only pose optimization; round 1 of this repo built the full Schur
solver (solvers/local_ba.py) yet likewise never called it from a pipeline.
This module is the missing stage: every K-th keyframe, the whole keyframe
ring + the map's observation lists become one BA problem, the Schur-reduced
LM solver refines all ring poses and observed landmarks, and the corrections
are scattered back into (KeyframeStore, MapState, current pose).

Design notes (TPU-first):
  * The observation set keeps the map's NATIVE (landmark, obs-slot) layout
    (GroupedBAProblem): every normal-equation block builds with dense
    one-hot einsums. The flat obs-list formulation needs 262k-row
    scatter-adds, which the TPU serializes (~1 s per solve); grouped is ~ms.
  * Landmark compaction: only the top `solver.max_landmarks` slots by live
    observation count enter the solve (static shape; the 16k-slot table is
    mostly empty). Write-back scatters through the selection indices.
  * The window is the full keyframe ring (Map::RemoveOldFrames already
    bounds it, Map.cpp:103-114), ordered oldest-first so the gauge clamp
    (num_fixed=1) pins the oldest pose. Stereo u_R rows pin per-keyframe
    scale.
  * The current frame's pose rides the newest keyframe's correction
    (T_cur <- T_kf_new . T_kf_old^-1 . T_cur), keeping tracking consistent
    with the refined map. Stale entries are impossible: keyframe eviction
    purges its observations (map.purge_kf_slot) and landmark-slot reuse
    resets the lists (map.add_points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.solvers import pose_opt
from trackingbench_slam_tpu.solvers.local_ba import (
    BAProblem, GroupedBAProblem, bundle_adjust_grouped)
from trackingbench_slam_tpu.utils.config import PipelineConfig


def build_window_problem_grouped(m, kfs, scale_factor: float,
                                 max_landmarks: int,
                                 window_keyframes: int = 0):
    """Keyframe ring + map observation lists -> GroupedBAProblem over the
    top-`max_landmarks` landmark slots by live observation count.

    window_keyframes > 0 makes the compaction WINDOW-AWARE: landmarks are
    ranked primarily by their live observations in the NEWEST
    `window_keyframes` ring keyframes (the only poses local_ba_step
    actually optimizes — everything older is a fixed vertex), with total
    live count as the tiebreak. Ranking by total count alone biased the
    selection toward old, long-tracked landmarks; on a rotation-heavy loop
    those are behind the camera by the time the window poses need
    constraints, and a starved window produced a divergent pose correction
    (measured: the closed-circle bench teleported without a loop closer at
    max_landmarks=2048; window-aware selection fixes the same run).

    Returns (problem, order, lm_idx) with order[d] = ring slot at dense
    window index d (oldest first) and lm_idx (L,) the selected map slots."""
    KF = kfs.T_cw.shape[0]
    big = jnp.iinfo(jnp.int32).max
    fid = jnp.where(kfs.valid, kfs.frame_id, big)
    order = jnp.argsort(fid)                      # dense -> slot
    dense_of_slot = jnp.zeros((KF,), jnp.int32).at[order].set(
        jnp.arange(KF, dtype=jnp.int32))          # slot -> dense

    slot_all = jnp.clip(m.obs_kf, 0, KF - 1)
    live = ((m.obs_kf >= 0) & kfs.valid[slot_all]) & m.valid[:, None]
    n_live = jnp.sum(live, axis=1)
    if window_keyframes > 0:
        n_valid = jnp.sum(kfs.valid)
        # dense index >= n_valid - W  <=>  one of the W newest keyframes
        in_window = (dense_of_slot[slot_all]
                     >= jnp.maximum(n_valid - window_keyframes, 0))
        n_win = jnp.sum(live & in_window, axis=1)
        # lexicographic (window count, total count); K <= 16 < 64
        rank = n_win * 64 + n_live
    else:
        rank = n_live
    _, lm_idx = jax.lax.top_k(rank, max_landmarks)  # (L,)

    kf_slot = m.obs_kf[lm_idx]                    # (L, O)
    feat = m.obs_feat[lm_idx]
    slot_c = jnp.clip(kf_slot, 0, KF - 1)
    feat_c = jnp.clip(feat, 0, kfs.kp_xy.shape[1] - 1)
    ok = ((kf_slot >= 0) & (feat >= 0) & m.valid[lm_idx][:, None]
          & kfs.valid[slot_c] & kfs.kp_valid[slot_c, feat_c])
    px = kfs.kp_xy[slot_c, feat_c]
    inv_s2 = pose_opt.level_inv_sigma2(kfs.kp_level[slot_c, feat_c],
                                       scale_factor)
    problem = GroupedBAProblem(
        T_cw=kfs.T_cw[order],
        points=m.pos[lm_idx],
        obs_kf=jnp.where(ok, dense_of_slot[slot_c], -1),
        obs_px=px,
        obs_inv_sigma2=inv_s2,
        obs_valid=ok,
        obs_ur=kfs.kp_ur[slot_c, feat_c],
    )
    return problem, order, lm_idx


def build_window_problem(m, kfs, scale_factor: float):
    """Flat-layout window builder (kept for the distributed solver and
    tests; the live stage uses the grouped builder above). Returns
    (BAProblem, order)."""
    KF = kfs.T_cw.shape[0]
    M, K = m.obs_kf.shape
    big = jnp.iinfo(jnp.int32).max
    fid = jnp.where(kfs.valid, kfs.frame_id, big)
    order = jnp.argsort(fid)
    dense_of_slot = jnp.zeros((KF,), jnp.int32).at[order].set(
        jnp.arange(KF, dtype=jnp.int32))
    kf_slot = m.obs_kf.reshape(-1)
    feat = m.obs_feat.reshape(-1)
    lm = jnp.repeat(jnp.arange(M, dtype=jnp.int32), K)
    slot_c = jnp.clip(kf_slot, 0, KF - 1)
    feat_c = jnp.clip(feat, 0, kfs.kp_xy.shape[1] - 1)
    ok = ((kf_slot >= 0) & (feat >= 0)
          & m.valid[lm] & kfs.valid[slot_c]
          & kfs.kp_valid[slot_c, feat_c])
    px = kfs.kp_xy[slot_c, feat_c]
    inv_s2 = pose_opt.level_inv_sigma2(kfs.kp_level[slot_c, feat_c],
                                       scale_factor)
    problem = BAProblem(
        T_cw=kfs.T_cw[order],
        points=m.pos,
        obs_kf=dense_of_slot[slot_c],
        obs_lm=lm,
        obs_px=px,
        obs_inv_sigma2=inv_s2,
        obs_valid=ok,
        obs_ur=kfs.kp_ur[slot_c, feat_c],
    )
    return problem, order


@functools.partial(jax.jit, static_argnames=("cfg", "num_fixed"))
def local_ba_step(state, cam: cam_mod.CameraParams, cfg: PipelineConfig,
                  num_fixed: int = 1):
    """One local-mapping pass: windowed BA over the ring, write-back into
    the VOState. Runs as a single device program.

    num_fixed: clamped oldest poses. Stereo windows use 1 (the u_R rows pin
    scale); MONO windows must use 2 — with a single clamp the similarity
    gauge leaves scale free and BA wanders along it."""
    m, kfs = state.map, state.kfs
    KF = kfs.T_cw.shape[0]
    problem, order, lm_idx = build_window_problem_grouped(
        m, kfs, cfg.pyramid.scale_factor, cfg.solver.max_landmarks,
        window_keyframes=cfg.solver.window_keyframes)
    if cfg.solver.stereo_gate_px > 0 and problem.obs_ur is not None:
        # kill heavy-tail u_R rows before the solve: the stereo-LK disparity
        # is unbiased but ~6x noisier than the left observations with multi-
        # pixel outliers (diag r3); a row whose residual at the CURRENT
        # (mm-accurate) window estimate exceeds the gate is tail, not signal.
        # The observation's mono rows stay in the problem.
        from trackingbench_slam_tpu.solvers import local_ba as lba
        r0, _, _, _, _ = lba._grouped_residuals(
            cam, problem.T_cw, problem.points, problem)
        bad_ur = ((problem.obs_ur >= 0)
                  & (jnp.abs(r0[..., 2]) > cfg.solver.stereo_gate_px))
        problem = problem._replace(
            obs_ur=jnp.where(bad_ur, -1.0, problem.obs_ur))
    # ORB-SLAM local-BA window semantics: only the newest
    # `solver.window_keyframes` poses optimize; every older ring pose is a
    # FIXED vertex whose observations still constrain the landmarks
    # (LocalBA.cpp's g2o role; ORB-SLAM's lFixedCameras). Without this the
    # whole ring kept re-optimizing against long-drifted LK observations —
    # measured on the bench corridor, full-ring BA made the keyframe ATE
    # WORSE than motion-only tracking (0.376 vs 0.299 cm) with the damage
    # concentrated in the oldest poses; see tools/diag_ba_gap.py.
    n_live = jnp.sum(kfs.valid)
    d = jnp.arange(KF, dtype=jnp.int32)
    fixed_mask = ((d < jnp.maximum(n_live - cfg.solver.window_keyframes,
                                   num_fixed))
                  | (d >= n_live))
    fixed_mask = fixed_mask.at[:num_fixed].set(True)
    if cfg.mesh.lm > 1:
        # landmark-sharded solve over the 'lm' mesh axis (SURVEY §7.8):
        # the grouped (L, O) layout shards with no partitioner — equal row
        # blocks of landmarks travel WITH their observations; the only
        # collective per LM iteration is one psum of the reduced (6K, 6K)
        # camera system (parallel/dist_ba.py).
        from trackingbench_slam_tpu.parallel import dist_ba
        from trackingbench_slam_tpu.parallel import mesh as mesh_mod
        assert cfg.solver.max_landmarks % cfg.mesh.lm == 0, (
            "solver.max_landmarks must divide evenly over mesh.lm shards")
        dev_mesh = mesh_mod.make_mesh(lm=cfg.mesh.lm, dp=cfg.mesh.dp)
        T_opt, X_opt = dist_ba.distributed_bundle_adjust_grouped(
            dev_mesh, cam, problem, iters=cfg.solver.ba_iters,
            huber_delta=cfg.solver.huber_delta,
            init_lambda=cfg.solver.init_lambda, num_fixed=num_fixed,
            fixed_mask=fixed_mask, stereo_weight=cfg.solver.stereo_weight)
    else:
        T_opt, X_opt = bundle_adjust_grouped(
            cam, problem, iters=cfg.solver.ba_iters,
            huber_delta=cfg.solver.huber_delta,
            init_lambda=cfg.solver.init_lambda, num_fixed=num_fixed,
            fixed_mask=fixed_mask, stereo_weight=cfg.solver.stereo_weight)

    ord_valid = kfs.valid[order]
    T_new = jnp.where(ord_valid[:, None, None], T_opt, problem.T_cw)
    kfs = kfs._replace(T_cw=kfs.T_cw.at[order].set(T_new))

    # only landmarks that actually had residuals move
    touched = jnp.any(problem.obs_valid, axis=1) & m.valid[lm_idx]
    new_pos = jnp.where(touched[:, None], X_opt, problem.points)
    m = m._replace(pos=m.pos.at[lm_idx].set(new_pos))

    # propagate the newest keyframe's correction to the live pose
    newest = jnp.clip(jnp.sum(kfs.valid) - 1, 0, KF - 1)
    T_old_kf = problem.T_cw[newest]
    T_new_kf = T_new[newest]
    corr = se3.compose(T_new_kf, se3.inverse(T_old_kf))
    T_cw = se3.normalize(se3.compose(corr, state.T_cw))
    return state._replace(map=m, kfs=kfs, T_cw=T_cw,
                          prev=state.prev._replace(T_cw=T_cw))


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_keyframe_ba_step(state, img_left: jax.Array, img_right: jax.Array,
                           cam: cam_mod.CameraParams, cfg: PipelineConfig):
    """track + keyframe + windowed BA fused into ONE device program for
    BA-cadence keyframes. Every unique dispatch over a remote transport
    costs a ~15-25 ms round trip (measured: a trivial jitted fn on fresh
    state buffers is ~23 ms wall), so folding the BA stage into the
    keyframe dispatch removes one such round trip per BA keyframe and lets
    XLA overlap the stages' device work."""
    from trackingbench_slam_tpu.models import vo as vo_mod
    state = vo_mod.track_step(state, img_left, cam, cfg)
    state = vo_mod.keyframe_step(state, img_right, cam, cfg)
    return local_ba_step(state, cam, cfg)
