"""Probe the keyframe step's state-WRITE costs (scatter/insert paths) that
bisect_keyframe2's DCE-prone prefixes hide.

    python benchmarks/bisect_writers.py [--cpu]
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
    from bench import build_config, render_frames
    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.models import vo, map as map_mod

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
        print(f"{label:46s} {dt:8.2f} ms", flush=True)
        return dt

    trivial = jax.jit(lambda s, r: s.T_cw + 1.0)
    args = list(zip(sts, rights))
    base = probe("launch overhead (trivial)", trivial, args)

    N = cfg.extractor.num_features

    def ssum(tree):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in
                   jax.tree_util.tree_leaves(tree))

    @jax.jit
    def p_atlas(state, right):
        f = state.prev
        slots = jnp.arange(f.capacity, dtype=jnp.int32) % state.map.capacity
        m = map_mod.write_anchor_patches(state.map, f.lk_pyr[0], f.kp_xy,
                                         slots, f.valid)
        return jnp.sum(m.anchor_atlas)

    @jax.jit
    def p_insert(state, right):
        kfs, _ = map_mod.insert_keyframe(state.kfs, state.prev,
                                         state.frame_id)
        return ssum(kfs)

    @jax.jit
    def p_addpoints(state, right):
        f = state.prev
        m = state.map
        want = f.valid & (f.map_idx < 0)
        p_w = jnp.ones((f.capacity, 3), jnp.float32)
        m, slots = map_mod.add_points(
            m, p_w, f.desc, p_w, p_w[:, 0], p_w[:, 0],
            jnp.zeros((f.capacity,), jnp.int32), f.kp_level, want)
        return ssum(m) + jnp.sum(slots)

    @jax.jit
    def p_addobs(state, right):
        f = state.prev
        feat_idx = jnp.arange(f.capacity, dtype=jnp.int32)
        m = map_mod.add_observations(
            state.map, jnp.clip(f.map_idx, 0, state.map.capacity - 1),
            jnp.asarray(0, jnp.int32), feat_idx, f.valid)
        return jnp.sum(m.obs_kf) + jnp.sum(m.obs_feat)

    @jax.jit
    def p_purge(state, right):
        m = map_mod.purge_kf_slot(state.map, jnp.asarray(1, jnp.int32),
                                  jnp.asarray(True))
        return jnp.sum(m.obs_kf) + jnp.sum(m.obs_feat)

    @jax.jit
    def p_unad(state, right):
        m = map_mod.update_normal_and_depth(
            state.map, state.kfs, cfg.pyramid.scale_factor,
            cfg.pyramid.num_levels)
        return jnp.sum(m.normal) + jnp.sum(m.max_dist)

    @jax.jit
    def p_cdd(state, right):
        m = map_mod.compute_distinctive_descriptors(state.map, state.kfs)
        return jnp.sum(m.desc.astype(jnp.float32))

    probe("write_anchor_patches (2000 cells)", p_atlas, args, base)
    probe("insert_keyframe", p_insert, args, base)
    probe("add_points", p_addpoints, args, base)
    probe("add_observations", p_addobs, args, base)
    probe("purge_kf_slot", p_purge, args, base)
    probe("update_normal_and_depth", p_unad, args, base)
    probe("compute_distinctive_descriptors", p_cdd, args, base)
    full = jax.jit(lambda s, r: ssum(vo.keyframe_step(s, r, cam, cfg)))
    probe("FULL keyframe_step (ssum)", full, args, base)


if __name__ == "__main__":
    main()
