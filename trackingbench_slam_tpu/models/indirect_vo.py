"""Indirect (extract-and-match every frame) VO — the reference's EuRoC driver.

Mirrors test_vo_1 (reference test/test_vo.cpp:109-296): ORB extraction every
frame, descriptor matching (NN) against the last keyframe, motion-only pose
optimization, stereo depth on every frame (bf=47.91 for EuRoC), every frame
promoted to keyframe. Demonstrates the matcher strategies are drop-in
interchangeable with the optical-flow pipeline (the commented alternates at
test_vo.cpp:211-213 are first-class config here: MatchStrategy).
"""

from __future__ import annotations

import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.geometry import triangulation as tri
from trackingbench_slam_tpu.matchers import matcher as matchers
from trackingbench_slam_tpu.models import map as map_mod
from trackingbench_slam_tpu.models import vo as vo_mod
from trackingbench_slam_tpu.models.extractors import extract_orb
from trackingbench_slam_tpu.models.frame import make_frame
from trackingbench_slam_tpu.ops.align import lk_pyramidal
from trackingbench_slam_tpu.solvers import pose_opt
from trackingbench_slam_tpu.utils.config import PipelineConfig


class MatchStrategy(enum.Enum):
    NN = "nn"
    BF = "bf"
    WINDOW = "window"
    PROJECTION = "projection"
    BOW = "bow"


@functools.partial(jax.jit, static_argnames=("cfg", "strategy"))
def indirect_track_step(state: vo_mod.VOState, img: jax.Array,
                        img_right: jax.Array,
                        cam: cam_mod.CameraParams,
                        cfg: PipelineConfig,
                        strategy: str = "nn",
                        voc=None) -> vo_mod.VOState:
    """One frame of the indirect pipeline (test_vo.cpp:194-285):
    extract -> match vs previous keyframe -> propagate landmarks ->
    pose optimize -> stereo depth -> new landmarks -> keyframe.

    voc: bow.Vocabulary (a pytree), required for strategy="bow" — the
    seventh-of-seven interchangeable strategy (searchByBow used for
    frame-to-frame tracking, the commented alternate at test_vo.cpp:211-213;
    matcher.cpp:619-721)."""
    f_cur = make_frame(img, cfg.extractor.num_features,
                       cfg.pyramid.num_levels, cfg.pyramid.scale_factor)
    f_cur = extract_orb(f_cur, cam, cfg.extractor, cfg.pyramid)
    f_cur = f_cur._replace(T_cw=state.T_cw)
    prev = state.prev

    # match current against the previous (key)frame
    if strategy == "nn":
        res = matchers.search_by_nn(f_cur.desc, f_cur.valid, prev.desc,
                                    prev.valid, prev.kp_level, prev.map_idx,
                                    cfg.matcher)
    elif strategy == "bf":
        res = matchers.search_by_bf(f_cur.desc, f_cur.valid, prev.desc,
                                    prev.valid, cfg.matcher)
    elif strategy == "window":
        res = matchers.search_by_window(f_cur, prev, cfg.matcher)
    elif strategy == "bow":
        from trackingbench_slam_tpu.bow import vocabulary as bow
        _, nodes_cur = bow.transform(voc, f_cur.desc, f_cur.valid)
        _, nodes_prev = bow.transform(voc, prev.desc, prev.valid)
        res = matchers.search_by_bow(
            f_cur.desc, f_cur.valid, nodes_cur, f_cur.kp_angle,
            prev.desc, prev.valid, nodes_prev, prev.kp_angle, cfg.matcher)
    else:  # projection
        res = matchers.search_by_projection_frame(
            cam, f_cur, prev, state.map.pos, cfg.matcher,
            cfg.pyramid.scale_factor, cfg.pyramid.num_levels)

    # landmark propagation along matches (test_vo.cpp:218-227)
    M = state.map.capacity
    matched_map = jnp.where(res.ok, prev.map_idx[res.idx], -1)
    f_cur = f_cur._replace(map_idx=matched_map)

    has_mp = (f_cur.map_idx >= 0) & f_cur.valid
    mp = jnp.clip(f_cur.map_idx, 0, M - 1)
    edges = has_mp & state.map.valid[mp]
    inv_s2 = pose_opt.level_inv_sigma2(f_cur.kp_level,
                                       cfg.pyramid.scale_factor)
    opt = pose_opt.pose_optimization(cam, state.T_cw, state.map.pos[mp],
                                     f_cur.kp_xy, inv_s2, edges, cfg.solver)
    f_cur = f_cur._replace(
        T_cw=opt.T_cw,
        map_idx=jnp.where(edges & ~opt.inliers, -1, f_cur.map_idx))

    new_state = state._replace(prev=f_cur, T_cw=opt.T_cw,
                               frame_id=state.frame_id + 1,
                               num_inliers=opt.num_inliers)
    # every frame is a keyframe with stereo landmarks (test_vo.cpp:239-285)
    return vo_mod.keyframe_step(new_state, img_right, cam, cfg)


class IndirectVO:
    """Host driver for the indirect pipeline."""

    def __init__(self, cfg: PipelineConfig,
                 strategy: MatchStrategy = MatchStrategy.NN,
                 voc=None):
        if strategy is MatchStrategy.BOW and voc is None:
            raise ValueError("MatchStrategy.BOW needs a trained "
                             "bow.Vocabulary (voc=...)")
        self.cfg = cfg
        self.cam = cam_mod.CameraParams.from_config(cfg.camera)
        self.strategy = strategy
        self.voc = voc
        self.state: Optional[vo_mod.VOState] = None
        self.trajectory: list = []

    def track(self, img_left, img_right):
        img_left = vo_mod.StereoVO._to_device(img_left)
        img_right = vo_mod.StereoVO._to_device(img_right)
        if self.state is None:
            self.state = vo_mod.init_state(self.cfg, img_left)
            self.state = vo_mod.keyframe_step(self.state, img_right,
                                              self.cam, self.cfg)
            self.state = self.state._replace(
                frame_id=self.state.frame_id + 1)
        else:
            self.state = indirect_track_step(
                self.state, img_left, img_right, self.cam, self.cfg,
                strategy=self.strategy.value, voc=self.voc)
        self.trajectory.append(self.state.T_cw)
        return self.state

    def poses(self):
        import numpy as np
        return np.asarray(jnp.stack(self.trajectory))
