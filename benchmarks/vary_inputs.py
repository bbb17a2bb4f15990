"""Distinguish result-caching from real execution: time track_step with the
SAME image repeatedly vs DIFFERENT images each call."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_config, render_frames
from trackingbench_slam_tpu.geometry.camera import CameraParams
from trackingbench_slam_tpu.models import vo


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    cfg, baseline = build_config()
    cam = CameraParams.from_config(cfg.camera)
    frames, gt = render_frames(cfg, baseline, 8)
    imgs = [jnp.asarray(f[0]) for f in frames]
    print("platform:", jax.devices()[0].platform, flush=True)

    state = vo.init_state(cfg, imgs[0])
    state = vo.keyframe_step(state, jnp.asarray(frames[0][1]), cam, cfg)

    st = vo.track_step(state, imgs[1], cam, cfg)
    jax.block_until_ready(st.T_cw)

    # same image, same state, 5 calls
    for tag, vary_img, vary_state in [("same-img same-state", False, False),
                                      ("diff-img same-state", True, False),
                                      ("diff-img chained-state", True, True)]:
        s = state
        t_all = []
        for i in range(5):
            img = imgs[2 + (i if vary_img else 0)]
            t0 = time.time()
            out = vo.track_step(s, img, cam, cfg)
            jax.block_until_ready(out.T_cw)
            t_all.append(time.time() - t0)
            if vary_state:
                s = out
        print(f"{tag:24s} " + " ".join(f"{t*1000:8.1f}" for t in t_all),
              flush=True)


if __name__ == "__main__":
    main()
