"""Attribute the LoopCloser's per-frame overhead on the live loop bench.

The r3 loop bench measured 24.8 fps without the closer and 6.9 fps with it
(VERDICT r3 weak #2). This instruments the exact bench scenario and buckets
wall time into: tracking dispatches, register_and_begin, finish_detect
(verdict fetch + candidate verification), and loop corrections.

    python benchmarks/bisect_loop.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from bench import build_config, _cached_frames
    from trackingbench_slam_tpu.bow import vocabulary as bow
    from trackingbench_slam_tpu.geometry import camera as cam_mod
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import make_frame
    from trackingbench_slam_tpu.models.loop_closer import LoopCloser
    from trackingbench_slam_tpu.models.vo import StereoVO
    from trackingbench_slam_tpu.utils.synthetic import (CorridorScene,
                                                        loop_trajectory)

    cfg, baseline = build_config()
    cfg = dataclasses.replace(cfg, lk_track_levels=3)
    cam = cam_mod.CameraParams.from_config(cfg.camera)
    n = 96

    def build():
        scene = CorridorScene(cfg.camera, width=10.0, height=5.0)
        gt = loop_trajectory(n, radius=1.5)

        def u8(a):
            return np.clip(a, 0, 255).astype(np.uint8)

        frames = []
        for i, T in enumerate(gt):
            if i == 0 or (i + 1) % cfg.keyframe_every == 0:
                L, R = scene.stereo_pair(T, baseline)
                frames.append((u8(L), u8(R)))
            else:
                frames.append((u8(scene.render(T)), None))
        return frames, gt

    tag = (f"loop_n{n}_{cfg.camera.width}x{cfg.camera.height}"
           f"_b{baseline}_kf{cfg.keyframe_every}_r1.5")
    frames, gt = _cached_frames(tag, build)

    descs = []
    for i in range(0, len(frames), 12):
        f = make_frame(jnp.asarray(frames[i][0], jnp.float32),
                       cfg.extractor.num_features, cfg.pyramid.num_levels,
                       cfg.pyramid.scale_factor)
        f = extract_orb(f, cam, cfg.extractor, cfg.pyramid)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train(np.concatenate(descs)[:4000], branching=6, depth=3,
                    seed=0)

    buckets = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            buckets[name] = buckets.get(name, 0.0) + (time.time() - t0)
            buckets[name + "_n"] = buckets.get(name + "_n", 0) + 1
            return out
        return wrap

    for rep in range(2):
        buckets.clear()
        vo = StereoVO(cfg)
        vo.loop_closer = LoopCloser(voc, cam, min_score=0.015,
                                    min_inliers=40, exclude_recent=5)
        lc = vo.loop_closer
        lc.register_precomputed = timed("register", lc.register_precomputed)
        lc.finish_detect = timed("finish_detect", lc.finish_detect)
        lc._verify = timed("verify", lc._verify)
        lc.correct_trajectory = timed("correct_traj", lc.correct_trajectory)
        import trackingbench_slam_tpu.models.vo as vo_mod
        orig_close = vo._close_loop
        vo._close_loop = timed("close_loop", orig_close)

        warm = min(2 * cfg.keyframe_every + 1, len(frames) - 1)
        for i in range(warm):
            vo.track(*frames[i])
        np.asarray(jax.device_get(vo.state.T_cw))
        t0 = time.time()
        for i in range(warm, len(frames)):
            vo.track(*frames[i])
        np.asarray(jax.device_get(vo.state.T_cw))
        total = time.time() - t0
        fps = (len(frames) - warm) / total
    print(f"fps={fps:.2f} total={total:.2f}s loops={len(vo.loop_events)}")
    for k in sorted(buckets):
        if k.endswith("_n"):
            continue
        print(f"  {k:16s} {buckets[k]*1000:9.1f} ms total "
              f"({buckets[k + '_n']} calls, "
              f"{buckets[k]*1000/max(buckets[k + '_n'],1):7.1f} ms/call)")
    accounted = sum(v for k, v in buckets.items() if not k.endswith("_n")
                    and k != "verify")  # verify nested in finish_detect
    print(f"  accounted (excl nested verify): {accounted*1000:.1f} ms "
          f"of {total*1000:.1f} ms")


if __name__ == "__main__":
    main()
