"""Diagnose the closer-less loop-bench arm: per-frame inliers + position.

Reproduces loop_closing_bench's without_loop_closer pass (same cached
frames, same config) but prints per-frame tracking health so a divergence
can be localized to a frame index.

    python benchmarks/loop_noclose_diag.py [--cpu] [--frames N]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import build_config, _cached_frames, _fence
    from trackingbench_slam_tpu.geometry import camera as cam_mod
    from trackingbench_slam_tpu.models.vo import StereoVO
    from trackingbench_slam_tpu.utils.synthetic import (CorridorScene,
                                                        loop_trajectory)

    n = 96
    for a in sys.argv:
        if a.startswith("--frames"):
            n = int(a.split("=", 1)[1]) if "=" in a else n
    cfg, baseline = build_config()
    cfg = dataclasses.replace(cfg, lk_track_levels=3)

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

    vo = StereoVO(cfg)
    for i in range(len(frames)):
        vo.track(*frames[i])
        st = vo.state
        pos = np.asarray(jax.device_get(st.T_cw))[:3, 3]
        ninl = int(np.asarray(jax.device_get(st.num_inliers)))
        gpos = np.linalg.inv(gt[i])[:3, 3]
        epos = np.linalg.inv(np.asarray(jax.device_get(st.T_cw))
                             @ gt[0])[:3, 3]
        err = float(np.linalg.norm(epos - gpos))
        flag = " <== LOST" if vo.lost else ""
        print(f"f{i:3d} inliers={ninl:5d} |t|={np.linalg.norm(pos):10.3f} "
              f"err={err:10.3f}{flag}", flush=True)
    _fence(vo)


if __name__ == "__main__":
    main()
