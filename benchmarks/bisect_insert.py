"""Standalone-op probes for the keyframe insert/maintenance group.

bisect_keyframe2 (cumulative prefixes) attributes ~22 ms to the
"insert" stage (add_points + anchor-atlas write + add_observations +
insert_keyframe + purge) and ~8 ms to maintenance — but not which op.
These probes time each map op ON SYNTHETIC STATES with the production
shapes (M=16384, K=16 obs, KF=16, N=2000 features), so no VO warmup /
pipeline compile is paid; each op is a small program.

    python benchmarks/bisect_insert.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.models import map as map_mod
    from trackingbench_slam_tpu.ops import packing

    M, K, KF, N = 16384, 16, 16, 2000
    r = np.random.RandomState(0)

    def mk_map(seed):
        rr = np.random.RandomState(seed)
        m = map_mod.empty_map(M, K)
        valid = jnp.asarray(rr.rand(M) < 0.5)
        return m._replace(
            pos=jnp.asarray(rr.randn(M, 3).astype(np.float32)),
            valid=valid,
            obs_kf=jnp.asarray(rr.randint(-1, KF, (M, K)).astype(np.int32)),
            obs_feat=jnp.asarray(rr.randint(-1, N, (M, K)).astype(np.int32)),
            obs_count=jnp.asarray(rr.randint(0, K, M).astype(np.int32)),
            desc=jnp.asarray(
                rr.randint(0, 2**31, (M, 8), dtype=np.int64).astype(
                    np.uint32)),
        )

    def mk_kfs(seed):
        rr = np.random.RandomState(seed)
        k = map_mod.empty_keyframes(KF, N)
        return k._replace(
            kp_xy=jnp.asarray(rr.rand(KF, N, 2).astype(np.float32) * 300),
            desc=jnp.asarray(
                rr.randint(0, 2**31, (KF, N, 8), dtype=np.int64).astype(
                    np.uint32)),
            map_idx=jnp.asarray(rr.randint(-1, M, (KF, N)).astype(np.int32)),
            kp_valid=jnp.asarray(rr.rand(KF, N) < 0.8),
            valid=jnp.ones((KF,), bool),
            frame_id=jnp.arange(KF, dtype=jnp.int32),
        )

    REPS = 4
    maps = [mk_map(s) for s in range(REPS)]
    kfss = [mk_kfs(s + 100) for s in range(REPS)]
    wants = [jnp.asarray(np.random.RandomState(s).rand(N) < 0.3)
             for s in range(REPS)]
    img = jnp.asarray(r.rand(370, 1226).astype(np.float32) * 255)
    kp_xy = jnp.asarray(np.stack([r.uniform(20, 1200, N),
                                  r.uniform(20, 350, N)],
                                 -1).astype(np.float32))
    posn = jnp.asarray(r.randn(N, 3).astype(np.float32))
    descn = jnp.asarray(r.randint(0, 2**31, (N, 8), dtype=np.int64)
                        .astype(np.uint32))
    fidx = jnp.arange(N, dtype=jnp.int32)

    def ssum(*ts):
        out = jnp.float32(0)
        for t in ts:
            for x in jax.tree_util.tree_leaves(t):
                out = out + jnp.sum(x.astype(jnp.float32))
        return out

    def drain(outs):
        for o in outs:
            np.asarray(jax.device_get(o))

    def probe(label, fn, arglists, base=0.0):
        outs = [fn(*a) for a in arglists]
        drain(outs)
        t0 = time.time()
        outs = [fn(*a) for a in arglists]
        drain(outs)
        dt = (time.time() - t0) / len(arglists) * 1000 - base
        print(f"{label:34s} {dt:8.2f} ms", flush=True)
        return dt

    argsM = [(m,) for m in maps]
    argsMW = [(m, w) for m, w in zip(maps, wants)]
    argsMK = [(m, k) for m, k in zip(maps, kfss)]

    base = probe("launch overhead",
                 jax.jit(lambda m: m.pos.sum() + 1.0), argsM)

    @jax.jit
    def p_free(m, w):
        return ssum(map_mod.free_slot_destinations(~m.valid, w))

    @jax.jit
    def p_add_points(m, w):
        mm, slots = map_mod.add_points(
            m, posn, descn, posn, posn[:, 0], posn[:, 1],
            jnp.broadcast_to(jnp.int32(3), (N,)),
            jnp.zeros((N,), jnp.int32), w)
        return ssum(mm, slots)

    @jax.jit
    def p_anchor_write(m, w):
        slots = jnp.where(w, jnp.arange(N, dtype=jnp.int32) * 7 % M, M)
        return ssum(map_mod.write_anchor_patches(m, img, kp_xy, slots, w))

    @jax.jit
    def p_add_obs(m, w):
        pi = jnp.arange(N, dtype=jnp.int32) * 5 % M
        return ssum(map_mod.add_observations(m, pi, jnp.int32(3), fidx, w))

    @jax.jit
    def p_purge(m, w):
        return ssum(map_mod.purge_kf_slot(m, jnp.int32(3), True))

    @jax.jit
    def p_insert_kf(m, k):
        # a FrameState stand-in: insert_keyframe only reads feature arrays
        from trackingbench_slam_tpu.models.frame import FrameState
        f = FrameState(
            pyramid=(img,), lk_pyr=(img,),
            kp_xy=kp_xy, kp_level=jnp.zeros((N,), jnp.int32),
            kp_angle=jnp.zeros((N,), jnp.float32),
            kp_response=jnp.zeros((N,), jnp.float32),
            desc=descn, bearing=jnp.zeros((N, 3), jnp.float32),
            map_idx=jnp.zeros((N,), jnp.int32),
            valid=jnp.ones((N,), bool),
            T_cw=jnp.eye(4, dtype=jnp.float32))
        kk, _ = map_mod.insert_keyframe(k, f, jnp.int32(40),
                                        slot=jnp.int32(3),
                                        kp_ur=kp_xy[:, 0])
        return ssum(kk)

    @jax.jit
    def p_und(m, k):
        return ssum(map_mod.update_normal_and_depth(m, k, 0.8, 3))

    @jax.jit
    def p_desc(m, k):
        return ssum(map_mod.compute_distinctive_descriptors(m, k))

    all_probes = [
        ("free_slot_destinations", p_free, argsMW),
        ("add_points (scatter_rows 14)", p_add_points, argsMW),
        ("write_anchor_patches", p_anchor_write, argsMW),
        ("add_observations", p_add_obs, argsMW),
        ("purge_kf_slot", p_purge, argsMW),
        ("insert_keyframe", p_insert_kf, argsMK),
        ("update_normal_and_depth", p_und, argsMK),
        ("compute_distinctive_descriptors", p_desc, argsMK),
    ]
    # --only=free_slot,add_points : substring filter (each probe costs a
    # minutes-long tunnel compile; the box fluctuates ~2x between runs, so
    # comparisons should come from probes in the SAME run)
    only = None
    for a in sys.argv:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    for label, fn, args in all_probes:
        if only is None or any(s in label for s in only):
            probe(label, fn, args, base)


if __name__ == "__main__":
    main()
