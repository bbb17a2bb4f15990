#!/usr/bin/env python
"""Diagnose VERDICT r2 weak #1: live windowed BA makes the corridor ATE
WORSE than motion-only tracking. Instruments each local_ba_step call:
relative-pose error between consecutive ring keyframes vs GT, before and
after the solve (relative errors are gauge-free, so they isolate the
solver's contribution from trajectory-stitching artifacts).

Usage: JAX_PLATFORMS=cpu python tools/diag_ba_gap.py [--frames 45]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def rel_kf_err(T_ring, fids, valid, gt):
    """Mean relative translation error between consecutive keyframes."""
    order = np.argsort(np.where(valid, fids, np.iinfo(np.int64).max))
    live = [s for s in order if valid[s]]
    errs = []
    for a, b in zip(live[:-1], live[1:]):
        ia, ib = max(int(fids[a]) - 1, 0), max(int(fids[b]) - 1, 0)
        if ib >= len(gt):
            continue
        rel_est = T_ring[b] @ np.linalg.inv(T_ring[a])
        rel_gt = gt[ib] @ np.linalg.inv(gt[ia])
        errs.append(np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3]))
    return float(np.mean(errs)) if errs else 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=45)
    p.add_argument("--ba-iters", type=int, default=None)
    p.add_argument("--max-landmarks", type=int, default=None)
    p.add_argument("--huber", type=float, default=None)
    p.add_argument("--bench-scale", action="store_true",
                   help="use the bench.py operating point (1226x370, 2000 "
                        "features, 16 KFs) instead of the small test scene")
    args = p.parse_args()

    import dataclasses
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from trackingbench_slam_tpu.models.vo import StereoVO, track_step, \
        track_and_keyframe_step
    from trackingbench_slam_tpu.models.local_mapping import local_ba_step
    from trackingbench_slam_tpu.utils import metrics
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig, SolverConfig)
    from trackingbench_slam_tpu.utils.synthetic import (
        CorridorScene, forward_yaw_trajectory)

    solver = SolverConfig()
    if args.ba_iters is not None:
        solver = dataclasses.replace(solver, ba_iters=args.ba_iters)
    if args.max_landmarks is not None:
        solver = dataclasses.replace(solver, max_landmarks=args.max_landmarks)
    if args.huber is not None:
        solver = dataclasses.replace(solver, huber_delta=args.huber)
    if args.bench_scale:
        cam = CameraConfig(width=1226, height=370, fx=707.09, fy=707.09,
                           cx=601.89, cy=183.11, bf=707.09 * 0.54)
        base = dict(camera=cam,
                    pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
                    extractor=ExtractorConfig(num_features=2000,
                                              min_threshold=12, cell_size=24),
                    map=MapConfig(max_keyframes=16, max_points=16384),
                    solver=solver, keyframe_every=5)
        scene = CorridorScene(cam, width=10.0, height=5.0)
        stereo_base = 0.54
        gt = forward_yaw_trajectory(args.frames, step=0.12, yaw_rate=0.01)
    else:
        cam = CameraConfig(width=512, height=384, fx=400, fy=400, cx=256,
                           cy=192, bf=400 * 0.3)
        base = dict(camera=cam,
                    pyramid=PyramidConfig(num_levels=3, scale_factor=0.8),
                    extractor=ExtractorConfig(num_features=800,
                                              min_threshold=10, cell_size=24),
                    map=MapConfig(max_keyframes=12, max_points=8192),
                    solver=solver, keyframe_every=5)
        scene = CorridorScene(cam)
        stereo_base = 0.3
        gt = forward_yaw_trajectory(args.frames, step=0.10, yaw_rate=0.012)
    frames = []
    for i, T in enumerate(gt):
        if i == 0 or (i + 1) % 5 == 0:
            frames.append(scene.stereo_pair(T, stereo_base))
        else:
            frames.append((scene.render(T), None))

    results = {}
    for ba in (0, 2):
        cfg = PipelineConfig(local_ba_every=ba, **base)
        vo = StereoVO(cfg)
        orig = local_ba_step

        if ba:
            # wrap local_ba_step to measure before/after rel-kf error
            import trackingbench_slam_tpu.models.local_mapping as lm_mod

            def wrapped(state, cam_, cfg_, num_fixed=1):
                fids = np.asarray(state.kfs.frame_id)
                valid = np.asarray(state.kfs.valid)
                before = rel_kf_err(np.asarray(state.kfs.T_cw), fids,
                                    valid, gt)
                out = orig(state, cam_, cfg_, num_fixed)
                after = rel_kf_err(np.asarray(out.kfs.T_cw), fids, valid, gt)
                print(f"  BA solve: rel-kf err {before*100:.3f} -> "
                      f"{after*100:.3f} cm "
                      f"({'BETTER' if after < before else 'WORSE'})")
                return out

            # patch the symbol vo.track resolves at call time
            import trackingbench_slam_tpu.models.vo as vo_mod
            lm_mod_orig = lm_mod.local_ba_step
            lm_mod.local_ba_step = wrapped

        for L, R in frames:
            vo.track(L, R)
        if ba:
            lm_mod.local_ba_step = lm_mod_orig
        P = vo.poses()
        Praw = vo.poses(refine_with_keyframes=False)
        ate = metrics.ate_rmse(P, gt, align=True)
        ate_raw = metrics.ate_rmse(Praw, gt, align=True)
        ee = np.linalg.norm(np.linalg.inv(P[-1])[:3, 3]
                            - np.linalg.inv(gt[-1])[:3, 3])
        results[ba] = (ate, ee)
        # keyframe-only ATE: are the (BA-refined) keyframe poses themselves
        # better than the tracked trajectory?
        fids = np.asarray(vo.state.kfs.frame_id)
        kvalid = np.asarray(vo.state.kfs.valid)
        kf_traj_idx = [max(int(f) - 1, 0) for f, v_ in zip(fids, kvalid) if v_]
        Tkf = np.asarray(vo.state.kfs.T_cw)[kvalid]
        ate_kf = metrics.ate_rmse(Tkf, gt[kf_traj_idx], align=True)
        ate_kf_trk = metrics.ate_rmse(P[kf_traj_idx], gt[kf_traj_idx],
                                      align=True)
        # aligned per-frame position error profile
        c_est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in P])
        c_gt = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt])
        mu_e, mu_g = c_est.mean(0), c_gt.mean(0)
        U, S, Vt = np.linalg.svd((c_gt - mu_g).T @ (c_est - mu_e))
        R = U @ Vt
        err_t = np.linalg.norm((c_est - mu_e) @ R.T - (c_gt - mu_g), axis=1)
        prof = " ".join(f"{e*100:.2f}" for e in err_t[::5])
        print(f"ba_every={ba}: ATE {ate*100:.3f} cm (raw {ate_raw*100:.3f}),"
              f" endpoint {ee*100:.3f} cm, kf-only ATE {ate_kf*100:.3f} cm"
              f" (same frames from traj: {ate_kf_trk*100:.3f})")
        print(f"  err profile (cm, every 5th frame): {prof}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
