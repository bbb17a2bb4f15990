"""Direct (SVO-style) visual odometry pipeline.

The reference exercises its direct matcher through the VO loop in
test/test_projection.cpp:408-656 (sparse image alignment against the last
keyframe + feature alignment + pose refinement, depth from a disparity
oracle). This pipeline is that loop as a library layer, with stereo LK depth
replacing the disparity file:

  per frame:
    1. sparse_image_align  (matchers/direct.py <- SparseImageAlign)
       photometric 6-DoF alignment of the current pyramid against the last
       keyframe's landmark-bearing features
    2. features_align      (<- FeaturesAlign/Align2D) refines the projected
       landmark positions in the current frame
    3. pose_optimization   (solvers/pose_opt.py) on the refined positions
       (SVO's "pose refinement" step)
  every k frames:
    4. FAST/Shi-Tomasi re-extraction + stereo depth -> new landmarks,
       current frame becomes the reference keyframe
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.geometry import triangulation as tri
from trackingbench_slam_tpu.matchers import direct
from trackingbench_slam_tpu.models.extractors import extract_fast
from trackingbench_slam_tpu.models.frame import FrameState, make_frame
from trackingbench_slam_tpu.ops.align import lk_pyramidal
from trackingbench_slam_tpu.solvers import pose_opt
from trackingbench_slam_tpu.utils.config import PipelineConfig


class DirectVO:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.cam = cam_mod.CameraParams.from_config(cfg.camera)
        self.kf: Optional[FrameState] = None     # reference keyframe
        self.kf_depth = None                     # (N,) depths in KF camera
        self.kf_pos_w = None                     # (N, 3) landmark positions
        self.T_cw = jnp.eye(4, dtype=jnp.float32)
        self.trajectory: list = []
        self.frame_id = 0
        self.num_tracked = 0

    def _make_keyframe(self, img_left, img_right, T_cw):
        cfg = self.cfg
        f = make_frame(img_left, cfg.extractor.num_features,
                       cfg.pyramid.num_levels, cfg.pyramid.scale_factor,
                       blur=False)
        f = extract_fast(f, self.cam, cfg.extractor, cfg.pyramid,
                         num_levels=min(3, cfg.pyramid.num_levels))
        f = f._replace(T_cw=T_cw)
        right = make_frame(img_right, 1, cfg.pyramid.num_levels,
                           cfg.pyramid.scale_factor, blur=False)
        lk = lk_pyramidal(f.lk_pyr, right.lk_pyr, f.kp_xy, f.valid, 0.5,
                          half=10, iters=30, num_levels=len(f.lk_pyr))
        lk_back = lk_pyramidal(right.lk_pyr, f.lk_pyr, lk.xy, f.valid, 0.5,
                               half=10, iters=30, num_levels=len(f.lk_pyr))
        fb_ok = (lk_back.converged
                 & (jnp.sum((lk_back.xy - f.kp_xy) ** 2, axis=-1) < 1.0))
        depth, disp_ok = tri.stereo_depth(self.cam.bf, f.kp_xy[:, 0],
                                          lk.xy[:, 0])
        ok = (f.valid & lk.converged & fb_ok & disp_ok
              & (jnp.abs(lk.xy[:, 1] - f.kp_xy[:, 1]) < 2.0)
              & (depth > 0.1) & (depth < 400.0))
        p_cam = tri.backproject(self.cam.fx, self.cam.fy, self.cam.cx,
                                self.cam.cy, f.kp_xy, depth)
        p_w = se3.transform_points(se3.inverse(T_cw), p_cam)
        self.kf = f._replace(valid=ok)
        self.kf_depth = jnp.where(ok, depth, 0.0)
        self.kf_pos_w = p_w

    def track(self, img_left, img_right=None):
        cfg = self.cfg
        img_left = jnp.asarray(img_left, jnp.float32)
        if self.kf is None:
            assert img_right is not None, "stereo bootstrap required"
            self._make_keyframe(img_left, jnp.asarray(img_right, jnp.float32),
                                self.T_cw)
            self.trajectory.append(self.T_cw)
            self.frame_id += 1
            return self.T_cw

        cur = make_frame(img_left, cfg.extractor.num_features,
                         cfg.pyramid.num_levels, cfg.pyramid.scale_factor,
                         blur=False)
        # 1. coarse-to-fine photometric alignment
        T_init = se3.compose(self.T_cw, se3.inverse(self.kf.T_cw))
        res = direct.sparse_image_align(
            self.cam, self.kf.pyramid, cur.pyramid, self.kf.kp_xy,
            self.kf_depth, self.kf.valid, T_init, cfg.direct,
            scale_factor=cfg.pyramid.scale_factor)
        T_cur_kf = res.T_cur_ref
        T_cw = se3.compose(T_cur_kf, self.kf.T_cw)
        cur = cur._replace(T_cw=T_cw)

        # 2. per-feature refinement against the keyframe
        fa = direct.features_align(
            self.cam, cur, self.kf.pyramid, self.kf.T_cw,
            self.kf_pos_w, self.kf.kp_xy, self.kf.valid, cfg.direct,
            num_levels=cfg.pyramid.num_levels,
            scale_factor=cfg.pyramid.scale_factor,
            cand_level=self.kf.kp_level)

        # 3. motion-only refinement on the aligned observations
        inv_s2 = jnp.ones((self.kf.capacity,), jnp.float32)
        opt = pose_opt.pose_optimization(
            self.cam, T_cw, self.kf_pos_w, fa.px_cur, inv_s2,
            fa.ok & self.kf.valid, cfg.solver)
        self.T_cw = opt.T_cw
        self.num_tracked = int(opt.num_inliers)

        self.trajectory.append(self.T_cw)
        self.frame_id += 1
        if img_right is not None and self.frame_id % cfg.keyframe_every == 0:
            self._make_keyframe(img_left, jnp.asarray(img_right, jnp.float32),
                                self.T_cw)
        return self.T_cw

    def poses(self):
        return np.asarray(jnp.stack(self.trajectory))
