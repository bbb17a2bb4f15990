"""Trustworthy stage timing on the axon remote TPU.

Two failure modes break naive timing here: (a) the runtime caches
identical dispatches, so repeat-same-args reps are free; (b)
block_until_ready returns immediately for remote arrays, so "fenced"
timings measure dispatch only. The fix: chain each op through a data
dependency N times, then force ONE scalar fetch (which genuinely blocks
on the whole chain), and divide.

    python benchmarks/chain_timer.py [--n 20]
"""

import argparse
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
from trackingbench_slam_tpu.models.extractors import extract_orb
from trackingbench_slam_tpu.models.frame import make_frame
from trackingbench_slam_tpu.ops.align import lk_pyramidal
from trackingbench_slam_tpu.ops.ransac import fundamental_ransac
from trackingbench_slam_tpu.solvers import pose_opt


def fetch(x):
    """Genuinely blocking readout: pull one scalar to host."""
    return float(jnp.asarray(x, jnp.float32).ravel()[0])


def chain(label, step, x0, n, fudge=None):
    """step: x -> x with a real data dependency. Times n chained calls."""
    x = step(x0)
    fetch(fudge(x) if fudge else x)  # compile + warm
    t0 = time.time()
    x = x0
    for _ in range(n):
        x = step(x)
    f = fetch(fudge(x) if fudge else x)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:42s} {dt:9.2f} ms/iter", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg, baseline = build_config()
    cam = CameraParams.from_config(cfg.camera)
    frames, gt = render_frames(cfg, baseline, 3)
    img0 = jnp.asarray(frames[0][0])
    img1 = jnp.asarray(frames[1][0])
    imgR = jnp.asarray(frames[0][1])
    fetch(img0.ravel()[0])
    print(f"platform: {jax.devices()[0].platform}  img {img0.shape}  "
          f"features {cfg.extractor.num_features}", flush=True)
    n = args.n
    N = cfg.extractor.num_features

    # --- full steps, chained through state ---
    st = vo.init_state(cfg, img0)
    st = vo.keyframe_step(st, imgR, cam, cfg)

    def track(s):
        return vo.track_step(s, img1, cam, cfg)

    chain("track_step (chained state)", track, st, n,
          fudge=lambda s: s.T_cw[0, 3])

    def kstep(s):
        return vo.keyframe_step(s, imgR, cam, cfg)

    st2 = track(st)
    chain("keyframe_step (chained state)", kstep, st2, max(n // 2, 4),
          fudge=lambda s: s.T_cw[0, 3])

    # --- sub-stages, chained through their own outputs ---
    mk = jax.jit(lambda im: make_frame(
        im, N, cfg.pyramid.num_levels, cfg.pyramid.scale_factor))

    def mk_chain(im):
        f = mk(im)
        return im + f.pyramid[0][0, 0] * 1e-12  # dep without changing content

    chain("make_frame (pyramid+blur)", mk_chain, img0, n)

    f0 = mk(img0)
    f0e = extract_orb(f0, cam, cfg.extractor, cfg.pyramid)
    f1 = mk(img1)

    def ex_chain(f):
        fe = extract_orb(f, cam, cfg.extractor, cfg.pyramid)
        return f._replace(T_cw=f.T_cw + fe.kp_xy[0, 0] * 1e-12)

    chain("extract_orb", ex_chain, f0, n, fudge=lambda f: f.T_cw[0, 0])

    def lk_chain(xy):
        r = lk_pyramidal(f0e.pyramid, f1.pyramid, xy, f0e.valid,
                         cfg.pyramid.scale_factor)
        return f0e.kp_xy + (r.xy - r.xy.mean()) * 1e-12

    chain("lk_pyramidal (track)", lk_chain, f0e.kp_xy, n,
          fudge=lambda xy: xy[0, 0])

    key = jax.random.PRNGKey(0)
    res1 = lk_pyramidal(f0e.pyramid, f1.pyramid, f0e.kp_xy, f0e.valid,
                        cfg.pyramid.scale_factor)

    def ransac_chain(xy):
        ok, _ = fundamental_ransac(xy, res1.xy, f0e.valid, key)
        return xy + ok[0].astype(jnp.float32) * 1e-12

    chain("fundamental_ransac", ransac_chain, f0e.kp_xy, n,
          fudge=lambda xy: xy[0, 0])

    rng = np.random.RandomState(0)
    pts = rng.rand(N, 3).astype(np.float32)
    pts[:, 2] += 5
    obs = np.asarray(pts[:, :2] / pts[:, 2:3] * 707.0
                     + np.array([601.0, 183.0], np.float32))
    pts, obs = jnp.asarray(pts), jnp.asarray(obs)

    def po_chain(T):
        out = pose_opt.pose_optimization(
            cam, T, pts, obs, jnp.ones((N,), jnp.float32),
            jnp.ones((N,), bool), cfg.solver)
        return out.T_cw

    chain("pose_optimization (4x10 LM)", po_chain,
          jnp.eye(4, dtype=jnp.float32), n, fudge=lambda T: T[0, 0])


if __name__ == "__main__":
    main()
