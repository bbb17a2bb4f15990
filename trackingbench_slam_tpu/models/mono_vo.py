"""Monocular VO: essential-matrix bootstrap + tracking with two-view
triangulated landmarks.

The reference has NO monocular capability — its "mono" driver test_vo_1
consumes stereo depth on every frame (test/test_vo.cpp:239-285). This
pipeline makes the mono configuration real (VERDICT item 8):

  bootstrap:  track features from frame 0 until median parallax clears a
              threshold, then geometry/epipolar.mono_bootstrap (F-RANSAC ->
              E -> cheirality) fixes T_10 up to scale and triangulates the
              initial map (median scene depth normalized to `init_depth` —
              mono scale is a convention, so trajectories are evaluated
              with scale-aligned (Umeyama with_scale) ATE).
  tracking:   the SAME jitted track_step as StereoVO (LK + motion model +
              motion-only GN).
  keyframes:  re-extract, then new landmarks by two-view DLT between the
              last keyframe and the current frame (poses known from
              tracking), gated by parallax angle and reprojection error.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import epipolar, se3
from trackingbench_slam_tpu.geometry.triangulation import triangulate_dlt
from trackingbench_slam_tpu.matchers import matcher as matchers
from trackingbench_slam_tpu.models import map as map_mod
from trackingbench_slam_tpu.models import vo as vo_mod
from trackingbench_slam_tpu.models.extractors import extract_orb
from trackingbench_slam_tpu.models.frame import make_frame
from trackingbench_slam_tpu.ops import packing
from trackingbench_slam_tpu.ops.align import lk_pyramidal
from trackingbench_slam_tpu.utils.config import PipelineConfig


def _K(cam: cam_mod.CameraParams) -> jax.Array:
    return jnp.asarray([[cam.fx, 0.0, cam.cx],
                        [0.0, cam.fy, cam.cy],
                        [0.0, 0.0, 1.0]], jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mono_keyframe_step(state: vo_mod.VOState, kf_lk_pyr, kf_T_cw,
                       cam: cam_mod.CameraParams,
                       cfg: PipelineConfig) -> vo_mod.VOState:
    """Mono keyframe: re-extract into free slots, triangulate landmark-less
    features against the LAST keyframe (two-view DLT through the tracked
    poses), then the shared map-maintenance path. The mono analogue of
    vo.keyframe_step's stereo-depth block."""
    f = state.prev
    fresh = extract_orb(f, cam, cfg.extractor, cfg.pyramid,
                        suppress_xy=f.kp_xy, suppress_valid=f.valid)
    dest = map_mod.free_slot_destinations(~f.valid, fresh.valid)
    (kp_xy, kp_level, kp_angle, kp_response, desc, bearing, map_idx,
     valid) = packing.scatter_rows_set(
        [f.kp_xy, f.kp_level, f.kp_angle, f.kp_response, f.desc,
         f.bearing, f.map_idx, f.valid],
        dest,
        [fresh.kp_xy, fresh.kp_level, fresh.kp_angle, fresh.kp_response,
         fresh.desc, fresh.bearing,
         jnp.full((f.capacity,), -1, jnp.int32),
         jnp.ones((f.capacity,), bool)])
    f = f._replace(kp_xy=kp_xy, kp_level=kp_level, kp_angle=kp_angle,
                   kp_response=kp_response, desc=desc, bearing=bearing,
                   map_idx=map_idx, valid=valid)

    # --- two-view depth: LK current -> last keyframe, DLT triangulation
    T_kf_cur = se3.compose(kf_T_cw, se3.inverse(f.T_cw))
    # prior: project at the median depth of live landmarks
    M = state.map.capacity
    alive = state.map.valid
    cam_c = se3.inverse(f.T_cw)[:3, 3]
    d_all = jnp.linalg.norm(state.map.pos - cam_c[None, :], axis=-1)
    med_d = jnp.nanmedian(jnp.where(alive, d_all, jnp.nan))
    med_d = jnp.where(jnp.isfinite(med_d), med_d, 8.0)
    xn = (f.kp_xy[:, 0] - cam.cx) / cam.fx
    yn = (f.kp_xy[:, 1] - cam.cy) / cam.fy
    p_guess = jnp.stack([xn * med_d, yn * med_d,
                         jnp.full_like(xn, med_d)], axis=-1)
    px_prior = cam_mod.world2cam(cam, se3.transform_points(T_kf_cur, p_guess))
    lk = lk_pyramidal(f.lk_pyr, kf_lk_pyr, f.kp_xy, f.valid, 0.5,
                      half=10, iters=30, num_levels=2,
                      init_offset=px_prior - f.kp_xy)
    lk_back = lk_pyramidal(kf_lk_pyr, f.lk_pyr, lk.xy, f.valid, 0.5,
                           half=10, iters=10, num_levels=1,
                           init_offset=f.kp_xy - lk.xy)
    fb_ok = (lk_back.converged
             & (jnp.sum((lk_back.xy - f.kp_xy) ** 2, axis=-1) < 1.0))
    K = _K(cam)
    P_cur = K @ f.T_cw[:3]
    P_kf = K @ kf_T_cw[:3]
    X_w = triangulate_dlt(P_cur, P_kf, f.kp_xy, lk.xy)  # world frame
    p_c = se3.transform_points(f.T_cw, X_w)
    p_k = se3.transform_points(kf_T_cw, X_w)
    # parallax gate (reject near-zero-baseline triangulations)
    r_c = X_w - se3.inverse(f.T_cw)[:3, 3][None, :]
    r_k = X_w - se3.inverse(kf_T_cw)[:3, 3][None, :]
    cosp = jnp.sum(r_c * r_k, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r_c, axis=-1) * jnp.linalg.norm(r_k, axis=-1), 1e-9)
    reproj = jnp.linalg.norm(cam_mod.world2cam(cam, p_c) - f.kp_xy, axis=-1)
    depth_ok = (f.valid & lk.converged & fb_ok
                & (p_c[:, 2] > 0.1) & (p_k[:, 2] > 0.1)
                & (cosp < 0.99995)          # > ~0.57 deg of parallax
                & (reproj < 1.5))

    # --- shared association/fusion pass (same as stereo keyframe_step)
    m0 = state.map
    proj = matchers.search_by_projection_map(
        cam, f, m0, cfg.matcher, scale_factor=cfg.pyramid.scale_factor,
        num_levels=cfg.pyramid.num_levels, only_unlinked=False,
        accept_th=float(cfg.matcher.th_low), use_ratio=False)
    pidx = jnp.clip(proj.idx, 0, M - 1)
    match_ok = proj.ok & m0.valid[pidx]
    # visibility census + found/visible culling — the same housekeeping as
    # the stereo keyframe path (vo.keyframe_step; MapPoint::IncreaseVisible
    # + ORB-SLAM's found-ratio cull). Without it, mono maps only ever grow
    # or fuse and chronically unmatched landmarks live forever.
    from trackingbench_slam_tpu.models.frame import is_in_frustum
    _, _, vis_now, _ = is_in_frustum(f, cam, m0.pos, m0.normal,
                                     m0.min_dist, m0.max_dist)
    m0 = map_mod.increase_visible(m0, jnp.arange(M, dtype=jnp.int32),
                                  vis_now & m0.valid)
    found_ratio = m0.n_found.astype(jnp.float32) / jnp.maximum(
        m0.n_visible, 1).astype(jnp.float32)
    cull = m0.valid & (m0.n_visible >= 8) & (found_ratio < 0.25)
    m0 = m0._replace(valid=m0.valid & ~cull)
    match_ok = match_ok & ~cull[pidx]
    # freed slots can be recycled by add_points later in this very step:
    # every link into a culled slot must drop NOW (frame + keyframe ring)
    f = f._replace(map_idx=jnp.where(
        (f.map_idx >= 0) & cull[jnp.clip(f.map_idx, 0, M - 1)], -1,
        f.map_idx))
    kfs_culled = state.kfs._replace(map_idx=jnp.where(
        (state.kfs.map_idx >= 0)
        & cull[jnp.clip(state.kfs.map_idx, 0, M - 1)], -1,
        state.kfs.map_idx))
    state = state._replace(kfs=kfs_culled)
    link = match_ok & (f.map_idx < 0) & f.valid
    f = f._replace(map_idx=jnp.where(link, pidx, f.map_idx))
    fuse = match_ok & (f.map_idx >= 0) & (pidx != f.map_idx) & ~link
    old_idx = jnp.clip(f.map_idx, 0, M - 1)
    keep_new = m0.obs_count[pidx] >= m0.obs_count[old_idx]
    keeper = jnp.where(keep_new, pidx, old_idx)
    victim = jnp.where(keep_new, old_idx, pidx)
    m0, redirect = map_mod.replace_points(m0, victim, keeper, fuse)
    f = f._replace(map_idx=jnp.where(f.map_idx >= 0, redirect[old_idx],
                                     f.map_idx))
    kfs0 = state.kfs._replace(map_idx=jnp.where(
        state.kfs.map_idx >= 0,
        redirect[jnp.clip(state.kfs.map_idx, 0, M - 1)],
        state.kfs.map_idx))
    state = state._replace(map=m0, kfs=kfs0)

    want = depth_ok & (f.map_idx < 0)
    T_wc = se3.inverse(f.T_cw)
    cam_center = T_wc[:3, 3]
    normal = X_w - cam_center[None, :]
    dist = jnp.linalg.norm(normal, axis=-1)
    normal = normal / jnp.maximum(dist[:, None], 1e-9)
    level_scale = jnp.power(1.0 / cfg.pyramid.scale_factor,
                            f.kp_level.astype(jnp.float32))
    max_dist = dist * level_scale
    min_dist = max_dist * (cfg.pyramid.scale_factor
                           ** (cfg.pyramid.num_levels - 1))
    kf_slot = map_mod.next_kf_slot(state.kfs).astype(jnp.int32)
    m = map_mod.purge_kf_slot(state.map, kf_slot, state.kfs.valid[kf_slot])
    m, slots = map_mod.add_points(
        m, X_w, f.desc, normal, min_dist, max_dist,
        jnp.broadcast_to(kf_slot, f.kp_level.shape), f.kp_level, want)
    got = want & (slots < m.capacity)
    f = f._replace(map_idx=jnp.where(got, slots, f.map_idx))
    feat_idx = jnp.arange(f.capacity, dtype=jnp.int32)
    tracked = f.valid & (f.map_idx >= 0) & ~got
    m = map_mod.add_observations(
        m, jnp.where(got, slots, f.map_idx), kf_slot, feat_idx,
        got | tracked, desc=f.desc)
    kfs, _ = map_mod.insert_keyframe(state.kfs, f, state.frame_id,
                                     slot=kf_slot)
    m = map_mod.update_normal_and_depth(m, kfs, cfg.pyramid.scale_factor,
                                        cfg.pyramid.num_levels)
    m = map_mod.compute_distinctive_descriptors(m, kfs)
    return state._replace(prev=f, map=m, kfs=kfs)


class MonoVO:
    """Host driver: bootstrap state machine + the shared tracking loop."""

    def __init__(self, cfg: PipelineConfig, init_depth: float = 8.0,
                 min_parallax_px: float = 25.0):
        self.cfg = cfg
        self.cam = cam_mod.CameraParams.from_config(cfg.camera)
        self.init_depth = init_depth
        self.min_parallax_px = min_parallax_px
        self.state: Optional[vo_mod.VOState] = None
        self.initialized = False
        self.trajectory: list = []
        self._f0 = None           # bootstrap reference frame
        self._cur_xy = None       # its features tracked to the latest frame
        self._kf_lk_pyr = None    # last keyframe's LK pyramid
        self._kf_T_cw = None
        self._fid = 0
        self._kf_count = 0
        self._key = jax.random.PRNGKey(7)

    def _try_bootstrap(self, img):
        cfg = self.cfg
        f = make_frame(img, cfg.extractor.num_features,
                       cfg.pyramid.num_levels, cfg.pyramid.scale_factor)
        if self._f0 is None:
            self._f0 = extract_orb(f, self.cam, cfg.extractor, cfg.pyramid)
            self._cur_xy = self._f0.kp_xy
            self.trajectory.append(jnp.eye(4, dtype=jnp.float32))
            return
        lk = lk_pyramidal(self._f0.lk_pyr, f.lk_pyr, self._f0.kp_xy,
                          self._f0.valid, 0.5, half=10, iters=30,
                          num_levels=len(self._f0.lk_pyr),
                          init_offset=self._cur_xy - self._f0.kp_xy)
        ok = self._f0.valid & lk.converged
        self._cur_xy = jnp.where(ok[:, None], lk.xy, self._cur_xy)
        par = jnp.nanmedian(jnp.where(
            ok, jnp.linalg.norm(lk.xy - self._f0.kp_xy, axis=-1), jnp.nan))
        self.trajectory.append(jnp.eye(4, dtype=jnp.float32))
        if not (float(par) > self.min_parallax_px and int(ok.sum()) > 60):
            return
        self._key, sub = jax.random.split(self._key)
        T_10, X, good, bok = epipolar.mono_bootstrap(
            _K(self.cam), self._f0.kp_xy, lk.xy, ok, sub)
        if not bool(bok):
            return
        # fix the free scale: median triangulated depth -> init_depth
        med = jnp.nanmedian(jnp.where(good, X[:, 2], jnp.nan))
        s = self.init_depth / jnp.maximum(med, 1e-6)
        X = X * s
        T_10 = T_10.at[:3, 3].mul(s)

        # seed the shared VOState: frame 0 is the first keyframe
        state = vo_mod.init_state(cfg, img)
        f0 = self._f0
        normal = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True),
                                 1e-9)
        dist = jnp.linalg.norm(X, axis=-1)
        m, slots = map_mod.add_points(
            state.map, X, f0.desc, normal, dist * 0.3, dist * 3.0,
            jnp.zeros(f0.kp_level.shape, jnp.int32), f0.kp_level, good)
        got = good & (slots < m.capacity)
        f0 = f0._replace(map_idx=jnp.where(got, slots, -1))
        feat_idx = jnp.arange(f0.capacity, dtype=jnp.int32)
        m = map_mod.add_observations(m, jnp.where(got, slots, -1),
                                     jnp.asarray(0, jnp.int32), feat_idx,
                                     got, desc=f0.desc)
        kfs, _ = map_mod.insert_keyframe(state.kfs, f0,
                                         jnp.asarray(0, jnp.int32),
                                         slot=jnp.asarray(0, jnp.int32))
        # current frame carries the tracked features + links
        f1 = f._replace(kp_xy=jnp.where(ok[:, None], lk.xy, f0.kp_xy),
                        kp_level=f0.kp_level, kp_angle=f0.kp_angle,
                        kp_response=f0.kp_response, desc=f0.desc,
                        bearing=f0.bearing,
                        map_idx=jnp.where(got & ok, slots, -1),
                        valid=ok, T_cw=T_10)
        self.state = state._replace(
            prev=f1, map=m, kfs=kfs, T_cw=T_10,
            frame_id=jnp.asarray(self._fid + 1, jnp.int32))
        self._kf_lk_pyr = f0.lk_pyr
        self._kf_T_cw = jnp.eye(4, dtype=jnp.float32)
        self.trajectory[-1] = T_10
        self.initialized = True

    def track(self, img):
        img = jnp.asarray(img, jnp.float32)
        self._fid += 1
        if not self.initialized:
            self._try_bootstrap(img)
            return self.trajectory[-1]
        self.state = vo_mod.track_step(self.state, img, self.cam, self.cfg)
        if self._fid % self.cfg.keyframe_every == 0:
            self.state = mono_keyframe_step(
                self.state, self._kf_lk_pyr, self._kf_T_cw, self.cam,
                self.cfg)
            self._kf_count += 1
            if (self.cfg.local_ba_every > 0
                    and self._kf_count % self.cfg.local_ba_every == 0):
                from trackingbench_slam_tpu.models.local_mapping import (
                    local_ba_step)
                # mono window: TWO clamped poses pin the scale gauge
                self.state = local_ba_step(self.state, self.cam, self.cfg,
                                           num_fixed=2)
            self._kf_lk_pyr = self.state.prev.lk_pyr
            self._kf_T_cw = self.state.T_cw
        self.trajectory.append(self.state.T_cw)
        return self.state.T_cw

    def poses(self):
        return np.asarray(jnp.stack(self.trajectory))
