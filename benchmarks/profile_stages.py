"""Per-stage timing of the VO pipeline (run on TPU or CPU).

    python benchmarks/profile_stages.py [--cpu] [--reps 5]

Times each jitted stage in isolation (post-compile, block_until_ready fenced)
so optimization effort goes where the milliseconds are.
"""

import argparse
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(label, fn, *args, reps=5, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:38s} {dt:9.2f} ms", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.models import vo
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import make_frame
    from trackingbench_slam_tpu.matchers import matcher as M
    from trackingbench_slam_tpu.ops.align import lk_pyramidal
    from trackingbench_slam_tpu.ops.ransac import fundamental_ransac
    from trackingbench_slam_tpu.solvers import pose_opt
    from bench import build_config, render_frames

    cfg, baseline = build_config()
    cam = CameraParams.from_config(cfg.camera)
    frames, gt = render_frames(cfg, baseline, 3)
    img0 = jnp.asarray(frames[0][0])
    img1 = jnp.asarray(frames[1][0])
    imgR = jnp.asarray(frames[0][1])
    print(f"platform: {jax.devices()[0].platform}  "
          f"img {img0.shape}  features {cfg.extractor.num_features}",
          flush=True)
    reps = args.reps

    N = cfg.extractor.num_features
    f0 = bench("make_frame (pyramid+blur)", jax.jit(
        lambda im: make_frame(im, N, cfg.pyramid.num_levels,
                              cfg.pyramid.scale_factor)), img0, reps=reps)
    f1 = jax.jit(lambda im: make_frame(im, N, cfg.pyramid.num_levels,
                                       cfg.pyramid.scale_factor))(img1)

    f0e = bench("extract_orb", extract_orb, f0, cam, cfg.extractor,
                cfg.pyramid, reps=reps)

    res = bench("lk_pyramidal (track)", lk_pyramidal, f0e.pyramid, f1.pyramid,
                f0e.kp_xy, f0e.valid, cfg.pyramid.scale_factor, reps=reps)

    key = jax.random.PRNGKey(0)
    bench("fundamental_ransac", fundamental_ransac, f0e.kp_xy, res.xy,
          f0e.valid, key, reps=reps)

    rng = np.random.RandomState(0)
    pts = rng.rand(N, 3).astype(np.float32)
    pts[:, 2] += 5
    obs = np.asarray(jax.jit(
        lambda p: jnp.stack([p[:, 0] / p[:, 2] * 707 + 601,
                             p[:, 1] / p[:, 2] * 707 + 183], axis=-1))(pts))
    bench("pose_optimization (4x10 LM)", pose_opt.pose_optimization, cam,
          jnp.eye(4, dtype=jnp.float32), jnp.asarray(pts), jnp.asarray(obs),
          jnp.ones((N,), jnp.float32), jnp.ones((N,), bool), reps=reps)

    st = vo.init_state(cfg, img0)
    bench("track_step (full)", vo.track_step, st, img1, cam, cfg, reps=reps)
    st2 = vo.track_step(st, img1, cam, cfg)
    bench("keyframe_step (full)", vo.keyframe_step, st2, imgR, cam, cfg,
          reps=reps)

    # dispatch overhead: trivial jitted op round-trip
    f_triv = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    bench("trivial dispatch round-trip", f_triv, x, reps=20)
    # host->device transfer of one image
    himg = np.asarray(frames[2][0])
    bench("device_put image f32", lambda a: jax.device_put(a), himg, reps=10)


if __name__ == "__main__":
    main()
