"""Bisect where track_step's wall time goes on the TPU: time progressively
larger prefixes of the step as single jitted programs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_config, render_frames
from trackingbench_slam_tpu.geometry.camera import CameraParams
from trackingbench_slam_tpu.models import vo
from trackingbench_slam_tpu.models.frame import make_frame, with_keypoints
from trackingbench_slam_tpu.matchers import matcher as matchers
from trackingbench_slam_tpu.solvers import pose_opt


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # fresh timing with per-call fencing to defeat async pipelining
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{label:44s} {min(ts)*1000:9.2f} ms (min of {reps})", flush=True)
    return out


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    cfg, baseline = build_config()
    cam = CameraParams.from_config(cfg.camera)
    frames, gt = render_frames(cfg, baseline, 3)
    img0 = jnp.asarray(frames[0][0])
    img1 = jnp.asarray(frames[1][0])
    print("platform:", jax.devices()[0].platform, flush=True)

    state = vo.init_state(cfg, img0)
    state = vo.keyframe_step(state, jnp.asarray(frames[0][1]), cam, cfg)

    N = cfg.extractor.num_features

    @jax.jit
    def p1_make(img):
        return make_frame(img, N, cfg.pyramid.num_levels,
                          cfg.pyramid.scale_factor)

    @jax.jit
    def p2_flow(state, img):
        f_cur = make_frame(img, N, cfg.pyramid.num_levels,
                           cfg.pyramid.scale_factor)
        key, sub = jax.random.split(state.key)
        res, xy = matchers.search_by_opflow(f_cur, state.prev, sub,
                                            cfg.matcher, use_ransac=False)
        return xy

    @jax.jit
    def p3_flow_ransac(state, img):
        f_cur = make_frame(img, N, cfg.pyramid.num_levels,
                           cfg.pyramid.scale_factor)
        key, sub = jax.random.split(state.key)
        res, xy = matchers.search_by_opflow(f_cur, state.prev, sub,
                                            cfg.matcher, use_ransac=True)
        return xy

    @jax.jit
    def p4_full_no_opt(state, img):
        f_cur = make_frame(img, N, cfg.pyramid.num_levels,
                           cfg.pyramid.scale_factor)
        key, sub = jax.random.split(state.key)
        res, xy = matchers.search_by_opflow(f_cur, state.prev, sub,
                                            cfg.matcher, use_ransac=True)
        f_cur = with_keypoints(f_cur, cam, xy, state.prev.kp_level,
                               state.prev.kp_angle, state.prev.kp_response,
                               state.prev.desc, res.ok)
        M = state.map.capacity
        mp = jnp.clip(state.prev.map_idx, 0, M - 1)
        pts_w = state.map.pos[mp]
        return pts_w, f_cur.kp_xy

    timeit("p1 make_frame", p1_make, img1)
    timeit("p2 +opflow(LK)", p2_flow, state, img1)
    timeit("p3 +ransac", p3_flow_ransac, state, img1)
    timeit("p4 +install/gather", p4_full_no_opt, state, img1)
    timeit("p5 full track_step", lambda s, i: vo.track_step(s, i, cam, cfg),
           state, img1)
    # isolated pose_opt at N=2000 again with per-call fence
    rng = np.random.RandomState(0)
    pts = rng.rand(N, 3).astype(np.float32)
    pts[:, 2] += 5
    obs = np.asarray(pts[:, :2] / pts[:, 2:3] * 707 + np.array([601, 183]))
    timeit("pose_optimization alone", lambda: pose_opt.pose_optimization(
        cam, jnp.eye(4, dtype=jnp.float32), jnp.asarray(pts),
        jnp.asarray(obs, jnp.float32), jnp.ones((N,), jnp.float32),
        jnp.ones((N,), bool)), reps=5)


if __name__ == "__main__":
    main()
