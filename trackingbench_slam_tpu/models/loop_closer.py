"""Loop closing: BoW retrieval -> bucketed matching -> geometric
verification -> pose-graph correction.

The reference carries all the ingredients (DBoW2 vocabulary + BowVector
scoring + FeatureVector-bucketed matching, SURVEY §2.2/2.3) but never
assembles loop closure. This module is the assembly, with each stage mapped
to its engine:

  1. candidate retrieval  — bow.BowDatabase.query (L1 score, recent frames
                            excluded)
  2. match               — matchers.search_by_bow (same-node Hamming)
  3. geometric check     — solvers.pose_opt on the candidate's landmarks
                           projected into the current frame; accept on
                           inlier count (the reference's PoseOptimization
                           returns exactly this count, LocalBA.cpp:489)
  4. correction          — a loop edge into solvers.pose_graph over the
                           keyframe ring
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trackingbench_slam_tpu.bow import vocabulary as bow
from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.matchers import matcher as matchers
from trackingbench_slam_tpu.solvers import pose_graph, pose_opt
from trackingbench_slam_tpu.utils.config import MatcherConfig, SolverConfig


@dataclasses.dataclass
class LoopCandidate:
    kf_index: int          # database / keyframe index of the loop partner
    score: float           # BoW similarity
    num_inliers: int
    T_cur_kf: np.ndarray   # relative pose current <- candidate keyframe


class LoopCloser:
    """Host-side orchestrator; all heavy steps are the jitted engines."""

    def __init__(self, voc: bow.Vocabulary, cam: cam_mod.CameraParams,
                 matcher_cfg: MatcherConfig = MatcherConfig(),
                 solver_cfg: SolverConfig = SolverConfig(),
                 min_score: float = 0.05, min_inliers: int = 30,
                 exclude_recent: int = 10):
        self.voc = voc
        self.cam = cam
        self.mcfg = matcher_cfg
        self.scfg = solver_cfg
        self.min_score = min_score
        self.min_inliers = min_inliers
        self.db = bow.BowDatabase(voc, capacity=1024)
        self.exclude_recent = exclude_recent
        # per-entry feature snapshots for matching/verification
        self.entries: list[dict] = []

    def add_keyframe(self, desc, valid, kp_xy, map_idx, map_pos, T_cw):
        """Register a keyframe: BowVector into the database + a feature
        snapshot for later verification."""
        words, nodes = bow.transform(self.voc, desc, valid)
        v = bow.bow_vector(self.voc, words, valid)
        idx = self.db.add(v)
        self.entries.append(dict(
            desc=desc, valid=valid, nodes=nodes, kp_xy=kp_xy,
            map_idx=np.asarray(map_idx), map_pos=np.asarray(map_pos),
            T_cw=np.asarray(T_cw), vec=v))
        return idx

    def detect(self, desc, valid, kp_xy, T_cw_init,
               init_from_candidate: bool = False) -> Optional[LoopCandidate]:
        """Query the database with the current frame; verify the best
        candidates geometrically. Returns the accepted loop or None.

        init_from_candidate seeds the geometric verification from the
        CANDIDATE keyframe's stored pose instead of T_cw_init — required for
        relocalization, where the current pose estimate is garbage by
        definition (loop closure keeps the drifted-but-close current pose)."""
        if len(self.entries) <= self.exclude_recent:
            return None
        words, nodes = bow.transform(self.voc, desc, valid)
        v = bow.bow_vector(self.voc, words, valid)
        idx, scores = self.db.query(v, top_k=3,
                                    exclude_recent=self.exclude_recent)
        for rank in range(3):
            kf = int(np.asarray(idx)[rank])
            score = float(np.asarray(scores)[rank])
            if kf < 0 or score < self.min_score or kf >= len(self.entries):
                continue
            cand = self.entries[kf]
            res = matchers.search_by_bow(
                desc, valid, nodes, jnp.zeros((desc.shape[0],), jnp.float32),
                cand["desc"], cand["valid"], cand["nodes"],
                jnp.zeros((cand["desc"].shape[0],), jnp.float32), self.mcfg)
            ok = np.asarray(res.ok)
            if ok.sum() < 8:
                continue
            # geometric verification: candidate's landmarks at matched
            # features, observed at the current frame's keypoints
            midx = cand["map_idx"][np.asarray(res.idx)]
            has = ok & (midx >= 0)
            if has.sum() < 8:
                continue
            pts_w = jnp.asarray(cand["map_pos"][np.clip(midx, 0, None)])
            T_init = (jnp.asarray(cand["T_cw"]) if init_from_candidate
                      else jnp.asarray(T_cw_init))
            opt = pose_opt.pose_optimization(
                self.cam, T_init, pts_w, kp_xy,
                jnp.ones((desc.shape[0],), jnp.float32), jnp.asarray(has),
                self.scfg)
            n_inl = int(opt.num_inliers)
            if n_inl >= self.min_inliers:
                T_cur_kf = np.asarray(se3.compose(
                    opt.T_cw, se3.inverse(jnp.asarray(cand["T_cw"]))))
                return LoopCandidate(kf_index=kf, score=score,
                                     num_inliers=n_inl, T_cur_kf=T_cur_kf)
        return None

    @staticmethod
    def correct_trajectory(T_cw_all: np.ndarray, loop: LoopCandidate,
                           cur_index: int, odom_weight: float = 1.0,
                           loop_weight: float = 5.0,
                           loop_frame_index: int | None = None):
        """Build + solve the pose graph with the loop edge
        (odometry chain edges from the trajectory as measured).

        loop_frame_index: trajectory index of the loop partner keyframe —
        needed when keyframes are a subset of trajectory frames (the live
        pipeline); defaults to loop.kf_index (keyframe == frame)."""
        lj = loop.kf_index if loop_frame_index is None else loop_frame_index
        K = cur_index + 1
        ei, ej, Tm, w = [], [], [], []
        for k in range(K - 1):
            ei.append(k)
            ej.append(k + 1)
            Tm.append(T_cw_all[k] @ np.linalg.inv(T_cw_all[k + 1]))
            w.append(odom_weight)
        ei.append(cur_index)
        ej.append(lj)
        Tm.append(loop.T_cur_kf)
        w.append(loop_weight)
        g = pose_graph.PoseGraph(
            T_cw=jnp.asarray(T_cw_all[:K], jnp.float32),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            T_meas=jnp.asarray(np.stack(Tm), jnp.float32),
            weight=jnp.asarray(w, jnp.float32),
            valid=jnp.ones((len(ei),), bool))
        T_opt, cost = pose_graph.optimize_pose_graph(g, iters=25)
        return np.asarray(T_opt), float(cost)


@jax.jit
def apply_loop_correction(state, T_new_traj: jax.Array):
    """Write a pose-graph-corrected trajectory back into the live VOState:
    keyframe ring poses move to their corrected trajectory nodes, every
    landmark is re-anchored through its reference keyframe's correction
    (p' = T_new^-1 . T_old . p keeps the landmark's camera-frame coordinates
    in the keyframe that created it), and the current pose becomes the last
    corrected node. One fused device program.

    T_new_traj: (F, 4, 4) corrected world->camera poses, index f holds the
    pose of device frame_id f+1 (trajectory convention of StereoVO)."""
    kfs, m = state.kfs, state.map
    F = T_new_traj.shape[0]
    idx = jnp.clip(kfs.frame_id - 1, 0, F - 1)
    T_old = kfs.T_cw
    T_new = jnp.where(kfs.valid[:, None, None], T_new_traj[idx], T_old)
    # per-keyframe world-frame re-anchoring transform
    A = jax.vmap(lambda tn, to: se3.compose(se3.inverse(tn), to))(
        T_new, T_old)  # (KF, 4, 4)
    KF = T_old.shape[0]
    ref = jnp.clip(m.ref_kf, 0, KF - 1)
    has_ref = (m.ref_kf >= 0) & m.valid & kfs.valid[ref]
    Ap = A[ref]
    p_new = (jnp.einsum("mij,mj->mi", Ap[:, :3, :3], m.pos)
             + Ap[:, :3, 3])
    m = m._replace(pos=jnp.where(has_ref[:, None], p_new, m.pos))
    T_cur = T_new_traj[-1]
    return state._replace(
        kfs=kfs._replace(T_cw=T_new), map=m, T_cw=T_cur,
        prev=state.prev._replace(T_cw=T_cur))
