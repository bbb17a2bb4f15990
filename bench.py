#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: full stereo-VO tracking frames/s per chip (steady-state,
excluding compile and synthetic-frame rendering), the BASELINE.json north
star. vs_baseline is the speedup over the same pipeline executed on one host
CPU — the measured stand-in for the reference's CPU frames/s (the reference
publishes no numbers and its C++ tree does not build, BASELINE.md; target is
>= 2x).

Usage:
  python bench.py            # TPU (axon) for the device number, CPU denominator
  python bench.py --cpu      # CPU-only (denominator == numerator path)
  python bench.py --quick    # fewer frames (smoke)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_config():
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig)
    baseline = 0.54
    # KITTI-ish operating point: 1226x370 gray, 2000 features
    cam = CameraConfig(width=1226, height=370, fx=707.09, fy=707.09,
                       cx=601.89, cy=183.11, bf=707.09 * baseline)
    cfg = PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=2000, min_threshold=12,
                                  cell_size=24),
        map=MapConfig(max_keyframes=16, max_points=16384),
        keyframe_every=5,
    )
    return cfg, baseline


def render_frames(cfg, baseline, n):
    import numpy as np
    from trackingbench_slam_tpu.utils.synthetic import (
        PlaneSequence, lateral_trajectory)
    seq = PlaneSequence(cfg.camera, depth=12.0)
    gt = lateral_trajectory(n, step=0.05)
    # uint8, like real camera frames off disk: ships 4x less host->device
    # traffic than f32 (the conversion happens on device in make_frame)
    def u8(a):
        return np.clip(a, 0, 255).astype(np.uint8)
    return [tuple(u8(im) for im in seq.stereo_pair(T, baseline))
            for T in gt], gt


def _fence(vo):
    """Genuinely blocking fence: the axon remote platform's
    block_until_ready returns immediately, but a device_get cannot."""
    import jax
    import numpy as np
    np.asarray(jax.device_get(vo.state.T_cw))


def time_pipeline(cfg, frames, gt, label):
    import jax
    import numpy as np
    from trackingbench_slam_tpu.models.vo import StereoVO
    from trackingbench_slam_tpu.utils import metrics

    vo = StereoVO(cfg)

    # 2-frame upload prefetcher: device_put the next frames while the
    # current one computes, so tunnel/PCIe transfer overlaps device time
    # (the right image is only needed on the keyframe cadence)
    pending = {}

    def needs_right(i):
        return i == 0 or (i + 1) % cfg.keyframe_every == 0

    def put(i):
        if i >= len(frames) or i in pending:
            return
        left, right = frames[i]
        pending[i] = (jax.device_put(left),
                      jax.device_put(right) if needs_right(i) else right)

    def step(i):
        put(i)
        put(i + 1)
        put(i + 2)
        vo.track(*pending.pop(i))

    # warmup: run the first cycle (compile track + keyframe paths)
    warm = min(cfg.keyframe_every + 1, len(frames) - 1)
    for i in range(warm):
        step(i)
    _fence(vo)
    t0 = time.time()
    for i in range(warm, len(frames)):
        step(i)
    _fence(vo)
    dt = time.time() - t0
    n = len(frames) - warm
    fps = n / dt
    ate = metrics.ate_rmse(vo.poses(), gt, align=True)
    print(f"[{label}] {n} frames in {dt:.2f}s = {fps:.2f} fps, "
          f"ATE {ate * 100:.2f} cm, inliers {int(vo.state.num_inliers)}",
          file=sys.stderr)
    return fps, ate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--frames", type=int, default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg, baseline = build_config()
    n = args.frames or (12 if args.quick else 40)
    print(f"rendering {n} synthetic stereo frames "
          f"({cfg.camera.width}x{cfg.camera.height})...", file=sys.stderr)
    frames, gt = render_frames(cfg, baseline, n)

    dev = jax.devices()[0]
    fps_dev, ate = time_pipeline(cfg, frames, gt, dev.platform)

    # denominator: same pipeline on one host CPU (reference-equivalent path)
    if dev.platform == "cpu":
        fps_cpu = fps_dev
    else:
        import subprocess, os, re
        out = subprocess.run(
            [sys.executable, __file__, "--cpu", "--frames",
             str(min(n, 12)), "--_denominator"],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
        m = re.search(r'"value": ([0-9.]+)', out.stdout)
        fps_cpu = float(m.group(1)) if m else float("nan")

    print(json.dumps({
        "metric": "stereo_vo_frames_per_s_per_chip",
        "value": round(fps_dev, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_dev / fps_cpu, 3) if fps_cpu == fps_cpu else None,
        "extra": {"ate_rmse_m": round(ate, 4), "platform": dev.platform,
                  "cpu_fps": round(fps_cpu, 3) if fps_cpu == fps_cpu else None},
    }))
    return 0


if __name__ == "__main__":
    # hidden flag: when invoked as the denominator subprocess, just bench CPU
    if "--_denominator" in sys.argv:
        sys.argv.remove("--_denominator")
    raise SystemExit(main())
