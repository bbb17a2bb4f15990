"""Bisect where keyframe_step's device time goes on the TPU.

Measurement per the repo's axon traps (see .claude/skills/verify/SKILL.md):
N INDEPENDENT pre-uploaded inputs, N back-to-back dispatches, ONE
device_get drain at the end — so neither dispatch caching (same buffers)
nor the ~16 ms chained-dispatch round trip pollutes the number. A trivial
jitted fn run the same way gives the launch-overhead baseline to subtract.

    python benchmarks/bisect_keyframe.py [--cpu]
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
                                                     with_keypoints)
    from trackingbench_slam_tpu.models.local_mapping import local_ba_step
    from trackingbench_slam_tpu.matchers import matcher as matchers
    from trackingbench_slam_tpu.ops import packing
    from trackingbench_slam_tpu.ops.align import anchored_align, lk_pyramidal
    from trackingbench_slam_tpu.geometry import triangulation as tri

    cfg, baseline = build_config()
    cam = CameraParams.from_config(cfg.camera)
    n_in = 8
    frames, gt = render_frames(cfg, baseline, 5 * n_in + 2)

    # build n_in INDEPENDENT states by running the pipeline (each keyframe
    # cadence boundary snapshots a distinct state)
    sts, rights = [], []
    st = None
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
        outs = [fn(*a) for a in args_list]   # compile + warm
        drain(outs)
        t0 = time.time()
        outs = [fn(*a) for a in args_list]
        drain(outs)
        dt = (time.time() - t0) / len(args_list) * 1000 - base_ms
        print(f"{label:46s} {dt:8.2f} ms", flush=True)
        return dt

    trivial = jax.jit(lambda s, r: s.T_cw + 1.0)
    args = list(zip(sts, rights))
    base = probe("launch overhead (trivial)", trivial, args)

    N = cfg.extractor.num_features

    @functools.partial(jax.jit, static_argnames=())
    def pA(state, right):
        f = state.prev
        m_pre = state.map
        M0 = m_pre.capacity
        mp_pre = jnp.clip(f.map_idx, 0, M0 - 1)
        has_anchor = (f.map_idx >= 0) & f.valid & m_pre.valid[mp_pre]
        centers = map_mod.atlas_cell_centers(mp_pre, m_pre.atlas_grid)
        aa = anchored_align(m_pre.anchor_atlas, f.lk_pyr[0], centers,
                            f.kp_xy, has_anchor, half=4, iters=10)
        return aa.xy

    @jax.jit
    def pB(state, right):
        f = state.prev
        fresh = extract_orb(f, cam, cfg.extractor, cfg.pyramid,
                            suppress_xy=f.kp_xy, suppress_valid=f.valid)
        return fresh.kp_xy

    @jax.jit
    def pC(state, right):
        from trackingbench_slam_tpu.models.frame import make_frame
        f = state.prev
        r = make_frame(right, 1, cfg.pyramid.num_levels,
                       cfg.pyramid.scale_factor, blur=False)
        lk = lk_pyramidal(f.lk_pyr, r.lk_pyr, f.kp_xy, f.valid, 0.5,
                          half=10, iters=30, num_levels=2)
        lk_b = lk_pyramidal(r.lk_pyr, f.lk_pyr, lk.xy, f.valid, 0.5,
                            half=10, iters=10, num_levels=1,
                            init_offset=f.kp_xy - lk.xy)
        return lk.xy + lk_b.xy

    @jax.jit
    def pD(state, right):
        f = state.prev
        m0 = state.map
        proj = matchers.search_by_projection_map(
            cam, f, m0, cfg.matcher, scale_factor=cfg.pyramid.scale_factor,
            num_levels=cfg.pyramid.num_levels, only_unlinked=False,
            accept_th=float(cfg.matcher.th_low), use_ratio=False)
        _, _, vis_now, _ = is_in_frustum(f, cam, m0.pos, m0.normal,
                                         m0.min_dist, m0.max_dist)
        return proj.idx, vis_now

    @jax.jit
    def pE(state, right):
        m = state.map
        kfs = state.kfs
        m = map_mod.update_normal_and_depth(m, kfs,
                                            cfg.pyramid.scale_factor,
                                            cfg.pyramid.num_levels)
        m = map_mod.compute_distinctive_descriptors(m, kfs)
        return m.normal

    probe("A anchored_align (2000 pts)", pA, args, base)
    probe("B extract_orb", pB, args, base)
    probe("C stereo LK + fb", pC, args, base)
    probe("D projection pass + frustum census", pD, args, base)
    probe("E normal/depth + distinctive desc", pE, args, base)
    probe("FULL keyframe_step", vo.keyframe_step,
          [(s, r, cam, cfg) for s, r in args], base)
    probe("FULL track_step", vo.track_step,
          [(s, jnp.asarray(frames[1][0]), cam, cfg) for s, _ in args], base)
    probe("FULL local_ba_step", local_ba_step,
          [(s, cam, cfg) for s, _ in args], base)


if __name__ == "__main__":
    main()
