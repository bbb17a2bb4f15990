"""Cumulative-prefix bisect of keyframe_step's device time.

The stage probes in bisect_keyframe.py cover the five named sub-stages but
those sum to ~13 ms while the full step costs ~59 ms — the rest is in the
map-update glue (scatter merges, culling/fusion, add_points, observation
writes, insert_keyframe). This script times CUMULATIVE PREFIXES of the
actual keyframe_step body, so consecutive differences attribute every
millisecond.

    python benchmarks/bisect_keyframe2.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import functools
    from bench import build_config, render_frames
    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.geometry import se3
    from trackingbench_slam_tpu.models import vo, map as map_mod
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import (is_in_frustum,
                                                     make_frame,
                                                     with_keypoints)
    from trackingbench_slam_tpu.matchers import matcher as matchers
    from trackingbench_slam_tpu.ops import packing
    from trackingbench_slam_tpu.ops.align import anchored_align, lk_pyramidal
    from trackingbench_slam_tpu.geometry import triangulation as tri

    cfg, baseline = build_config()
    cam = CameraParams.from_config(cfg.camera)
    n_in = 8
    frames, gt = render_frames(cfg, baseline, 5 * n_in + 2)

    sts, rights = [], []
    vo_h = vo.StereoVO(cfg)
    for i, (L, R) in enumerate(frames):
        vo_h.track(L, R)
        if R is not None and len(sts) < n_in:
            sts.append(vo_h.state)
            rights.append(jnp.asarray(R))
    assert len(sts) == n_in

    def drain(outs):
        for o in outs:
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]))

    def probe(label, fn, args_list, base_ms=0.0):
        outs = [fn(*a) for a in args_list]
        drain(outs)
        t0 = time.time()
        outs = [fn(*a) for a in args_list]
        drain(outs)
        dt = (time.time() - t0) / len(args_list) * 1000 - base_ms
        print(f"{label:52s} {dt:8.2f} ms", flush=True)
        return dt

    trivial = jax.jit(lambda s, r: s.T_cw + 1.0)
    args = list(zip(sts, rights))
    base = probe("launch overhead (trivial)", trivial, args)

    def ssum(*trees):
        return sum(jnp.sum(x.astype(jnp.float32)) for t in trees
                   for x in jax.tree_util.tree_leaves(t))

    def kf_prefix(state, img_right, stop: str):
        """keyframe_step body with an early exit after the named stage.
        Mirrors models/vo.py keyframe_step exactly."""
        f = state.prev
        m_pre = state.map
        M0 = m_pre.capacity
        mp_pre = jnp.clip(f.map_idx, 0, M0 - 1)
        has_anchor = (f.map_idx >= 0) & f.valid & m_pre.valid[mp_pre]
        centers = map_mod.atlas_cell_centers(mp_pre, m_pre.atlas_grid)
        aa = anchored_align(m_pre.anchor_atlas, f.lk_pyr[0], centers,
                            f.kp_xy, has_anchor, half=4, iters=10)
        drift = jnp.sum((aa.xy - f.kp_xy) ** 2, axis=-1)
        snap = has_anchor & aa.converged & (drift < 2.25)
        new_xy = jnp.where(snap[:, None], aa.xy, f.kp_xy)
        f = with_keypoints(f, cam, new_xy, f.kp_level, f.kp_angle,
                           f.kp_response, f.desc, f.valid)
        if stop == "anchor":
            return ssum(f)

        fresh = extract_orb(f, cam, cfg.extractor, cfg.pyramid,
                            suppress_xy=f.kp_xy, suppress_valid=f.valid)
        if stop == "extract":
            return ssum(f, fresh)
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
        if stop == "merge":
            return ssum(f)

        right = make_frame(img_right, 1, cfg.pyramid.num_levels,
                           cfg.pyramid.scale_factor, blur=False)
        M = state.map.capacity
        has_mp = (f.map_idx >= 0) & f.valid
        mp = jnp.clip(f.map_idx, 0, M - 1)
        p_c = se3.transform_points(f.T_cw, state.map.pos[mp])
        z = p_c[:, 2]
        known = has_mp & state.map.valid[mp] & (z > 0.2)
        disp = cam.bf / jnp.maximum(z, 0.2)
        med_disp = jnp.nanmedian(jnp.where(known, disp, jnp.nan))
        have_prior = jnp.isfinite(med_disp) & (jnp.sum(known) >= 10)
        disp_i = jnp.where(known, disp, jnp.where(have_prior, med_disp, 0.0))
        prior = jnp.stack([-disp_i, jnp.zeros_like(disp_i)], axis=-1)
        full = lambda: lk_pyramidal(f.lk_pyr, right.lk_pyr, f.kp_xy, f.valid,
                                    0.5, half=10, iters=30,
                                    num_levels=len(f.lk_pyr))
        primed = lambda: lk_pyramidal(f.lk_pyr, right.lk_pyr, f.kp_xy,
                                      f.valid, 0.5, half=10, iters=30,
                                      num_levels=2, init_offset=prior)
        lk = jax.lax.cond(have_prior, primed, full)
        lk_back = lk_pyramidal(right.lk_pyr, f.lk_pyr, lk.xy, f.valid,
                               0.5, half=10, iters=10, num_levels=1,
                               init_offset=f.kp_xy - lk.xy)
        fb_ok = (lk_back.converged
                 & (jnp.sum((lk_back.xy - f.kp_xy) ** 2, axis=-1) < 1.0))
        depth, disp_ok = tri.stereo_depth(cam.bf, f.kp_xy[:, 0], lk.xy[:, 0])
        row_ok = jnp.abs(lk.xy[:, 1] - f.kp_xy[:, 1]) < 2.0
        depth_ok = (f.valid & lk.converged & fb_ok & disp_ok & row_ok
                    & (depth > 0.1) & (depth < 400.0))
        if stop == "stereo":
            return ssum(f, depth, depth_ok, lk.xy)

        p_cam = tri.backproject(cam.fx, cam.fy, cam.cx, cam.cy, f.kp_xy,
                                depth)
        T_wc = se3.inverse(f.T_cw)
        p_w = se3.transform_points(T_wc, p_cam)

        m0 = state.map
        proj = matchers.search_by_projection_map(
            cam, f, m0, cfg.matcher, scale_factor=cfg.pyramid.scale_factor,
            num_levels=cfg.pyramid.num_levels, only_unlinked=False,
            accept_th=float(cfg.matcher.th_low), use_ratio=False)
        pidx = jnp.clip(proj.idx, 0, M - 1)
        match_ok = proj.ok & m0.valid[pidx]
        _, _, vis_now, _ = is_in_frustum(f, cam, m0.pos, m0.normal,
                                         m0.min_dist, m0.max_dist)
        m0 = map_mod.increase_visible(m0, jnp.arange(M, dtype=jnp.int32),
                                      vis_now & m0.valid)
        found_ratio = m0.n_found.astype(jnp.float32) / jnp.maximum(
            m0.n_visible, 1).astype(jnp.float32)
        cull = m0.valid & (m0.n_visible >= 8) & (found_ratio < 0.25)
        m0 = m0._replace(valid=m0.valid & ~cull)
        match_ok = match_ok & ~cull[pidx]
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
        f = f._replace(map_idx=jnp.where(
            f.map_idx >= 0, redirect[old_idx], f.map_idx))
        kfs0 = state.kfs
        kfs0 = kfs0._replace(map_idx=jnp.where(
            kfs0.map_idx >= 0,
            redirect[jnp.clip(kfs0.map_idx, 0, M - 1)], kfs0.map_idx))
        state = state._replace(map=m0, kfs=kfs0)
        if stop == "fuse":
            return ssum(f, state, depth, depth_ok, lk.xy)

        want = depth_ok & (f.map_idx < 0)
        cam_center = T_wc[:3, 3]
        normal = p_w - cam_center[None, :]
        dist = jnp.linalg.norm(normal, axis=-1)
        normal = normal / jnp.maximum(dist[:, None], 1e-9)
        level_scale = jnp.power(1.0 / cfg.pyramid.scale_factor,
                                f.kp_level.astype(jnp.float32))
        max_dist = dist * level_scale
        min_dist = max_dist * (cfg.pyramid.scale_factor
                               ** (cfg.pyramid.num_levels - 1))
        kf_slot = map_mod.next_kf_slot(state.kfs).astype(jnp.int32)
        m = map_mod.purge_kf_slot(state.map, kf_slot,
                                  state.kfs.valid[kf_slot])
        if stop == "purge":
            return ssum(f, state, m, depth_ok, lk.xy)
        m, slots = map_mod.add_points(
            m, p_w, f.desc, normal, min_dist, max_dist,
            jnp.broadcast_to(kf_slot, f.kp_level.shape), f.kp_level, want)
        if stop == "addpts":
            return ssum(f, state, m, slots, depth_ok, lk.xy)
        got = want & (slots < m.capacity)
        m = map_mod.write_anchor_patches(m, f.lk_pyr[0], f.kp_xy, slots, got)
        if stop == "atlas":
            return ssum(f, state, m, slots, depth_ok, lk.xy)
        f = f._replace(map_idx=jnp.where(got, slots, f.map_idx))
        feat_idx = jnp.arange(f.capacity, dtype=jnp.int32)
        tracked = f.valid & (f.map_idx >= 0) & ~got
        m = map_mod.add_observations(
            m, jnp.where(got, slots, f.map_idx), kf_slot, feat_idx,
            got | tracked)
        if stop == "obs":
            return ssum(f, state, m, depth_ok, lk.xy)
        kp_ur = jnp.where(depth_ok, lk.xy[:, 0], -1.0)
        kfs, _ = map_mod.insert_keyframe(state.kfs, f, state.frame_id,
                                         slot=kf_slot, kp_ur=kp_ur)
        if stop == "insert":
            return ssum(f, state, m, kfs)

        m = map_mod.update_normal_and_depth(m, kfs,
                                            cfg.pyramid.scale_factor,
                                            cfg.pyramid.num_levels)
        m = map_mod.compute_distinctive_descriptors(m, kfs)
        return ssum(f, state, m, kfs)

    stops = ["fuse", "purge", "addpts", "atlas", "obs", "insert", "full"]
    if "--coarse" in sys.argv:
        stops = ["anchor", "extract", "merge", "stereo", "fuse", "insert",
                 "full"]
    for a in sys.argv:
        # --stops=anchor,stereo,full : arbitrary prefix list (each prefix
        # costs a minutes-long tunnel compile; pick only what you need)
        if a.startswith("--stops="):
            stops = a.split("=", 1)[1].split(",")
    prev = 0.0
    for s in stops:
        fn = jax.jit(functools.partial(kf_prefix, stop=s))
        dt = probe(f"prefix through {s}", fn, args, base)
        print(f"    delta {s}: {dt - prev:+.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
