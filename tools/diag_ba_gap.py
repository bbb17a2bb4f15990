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
    p.add_argument("--stereo-weight", type=float, default=None)
    p.add_argument("--bench-scale", action="store_true",
                   help="use the bench.py operating point (1226x370, 2000 "
                        "features, 16 KFs) instead of the small test scene")
    p.add_argument("--skip-off", action="store_true",
                   help="only run the BA-on config")
    p.add_argument("--no-ur", action="store_true",
                   help="drop the stereo u_R rows from the BA window")
    p.add_argument("--gt-obs", action="store_true",
                   help="before each BA solve, overwrite the ring "
                        "observations with GT-pose projections of the "
                        "current landmark estimates — isolates solver "
                        "correctness from observation (LK drift) bias")
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
    if args.stereo_weight is not None:
        solver = dataclasses.replace(solver, stereo_weight=args.stereo_weight)
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

    if args.no_ur:
        import trackingbench_slam_tpu.models.local_mapping as lm_mod0
        _orig_build = lm_mod0.build_window_problem_grouped

        def _build_no_ur(*a, **kw):
            prob, order, lm_idx = _orig_build(*a, **kw)
            import jax.numpy as jnpp
            prob = prob._replace(obs_ur=jnpp.full_like(prob.obs_ur, -1.0))
            return prob, order, lm_idx

        lm_mod0.build_window_problem_grouped = _build_no_ur

    results = {}
    for ba in ((2,) if args.skip_off else (0, 2)):
        cfg = PipelineConfig(local_ba_every=ba, **base)
        vo = StereoVO(cfg)
        orig = local_ba_step

        if ba:
            # wrap local_ba_step to measure before/after rel-kf error
            import trackingbench_slam_tpu.models.local_mapping as lm_mod

            def doctor_obs(state, cam_):
                """Overwrite ring kp_xy/kp_ur with GT projections of the
                current landmark estimates (diagnostic only)."""
                import jax.numpy as jnpp
                kfs = state.kfs
                m = state.map
                fids = np.asarray(kfs.frame_id)
                kvalid = np.asarray(kfs.valid)
                kp_xy = np.asarray(kfs.kp_xy).copy()
                kp_ur = np.asarray(kfs.kp_ur).copy()
                midx = np.asarray(kfs.map_idx)
                kpv = np.asarray(kfs.kp_valid)
                pos = np.asarray(m.pos)
                mval = np.asarray(m.valid)
                for s in range(kp_xy.shape[0]):
                    if not kvalid[s]:
                        continue
                    ti = max(int(fids[s]) - 1, 0)
                    if ti >= len(gt):
                        continue
                    T = gt[ti]
                    sel = (midx[s] >= 0) & kpv[s]
                    lm = np.clip(midx[s], 0, pos.shape[0] - 1)
                    sel &= mval[lm]
                    pc = pos[lm] @ T[:3, :3].T + T[:3, 3]
                    z = np.maximum(pc[:, 2], 1e-3)
                    u = cam_.fx * pc[:, 0] / z + cam_.cx
                    v = cam_.fy * pc[:, 1] / z + cam_.cy
                    sel &= pc[:, 2] > 0.1
                    kp_xy[s, sel, 0] = u[sel]
                    kp_xy[s, sel, 1] = v[sel]
                    had_ur = kp_ur[s] >= 0
                    ur = u - cam_.bf / z
                    kp_ur[s, sel & had_ur] = ur[sel & had_ur]
                kfs = kfs._replace(kp_xy=jnpp.asarray(kp_xy),
                                   kp_ur=jnpp.asarray(kp_ur))
                return state._replace(kfs=kfs)

            def obs_quality(state, cam_):
                """Mean |reproj residual| per keyframe, with landmarks
                triangulated through GT poses (isolates observation error
                from pose error)."""
                kfs = state.kfs
                m = state.map
                fids = np.asarray(kfs.frame_id)
                kvalid = np.asarray(kfs.valid)
                midx = np.asarray(kfs.map_idx)
                kpv = np.asarray(kfs.kp_valid)
                kp = np.asarray(kfs.kp_xy)
                KF, N = midx.shape
                Mcap = m.capacity
                # collect obs per landmark: (kf_traj_idx, px)
                per_lm = {}
                for s in range(KF):
                    if not kvalid[s]:
                        continue
                    ti = max(int(fids[s]) - 1, 0)
                    if ti >= len(gt):
                        continue
                    sel = np.where((midx[s] >= 0) & kpv[s])[0]
                    for f_ in sel:
                        per_lm.setdefault(int(midx[s, f_]), []).append(
                            (s, ti, f_, kp[s, f_]))
                errs_by_slot = {s: [] for s in range(KF)}
                ur_errs = []
                kp_ur = np.asarray(kfs.kp_ur)
                for lm, obs in per_lm.items():
                    if len(obs) < 2:
                        continue
                    # DLT through GT poses
                    A = []
                    for s, ti, f_, px in obs:
                        T = gt[ti]
                        P = np.zeros((3, 4))
                        P[:3, :3] = T[:3, :3]
                        P[:3, 3] = T[:3, 3]
                        Km = np.array([[cam_.fx, 0, cam_.cx],
                                       [0, cam_.fy, cam_.cy], [0, 0, 1.0]])
                        P = Km @ P
                        A.append(px[0] * P[2] - P[0])
                        A.append(px[1] * P[2] - P[1])
                    A = np.stack(A)
                    _, _, Vt = np.linalg.svd(A)
                    X = Vt[-1]
                    X = X[:3] / X[3]
                    for s, ti, f_, px in obs:
                        T = gt[ti]
                        pc = T[:3, :3] @ X + T[:3, 3]
                        if pc[2] < 0.1:
                            continue
                        u = cam_.fx * pc[0] / pc[2] + cam_.cx
                        v = cam_.fy * pc[1] / pc[2] + cam_.cy
                        errs_by_slot[s].append(np.hypot(px[0] - u,
                                                        px[1] - v))
                        ur = kp_ur[s, f_]
                        if ur >= 0:
                            ur_errs.append(ur - (u - cam_.bf / pc[2]))
                parts = []
                order = np.argsort(np.where(kvalid, fids, 10 ** 9))
                for s in order:
                    if kvalid[s] and errs_by_slot[s]:
                        parts.append(f"{np.mean(errs_by_slot[s]):.3f}")
                print(f"  obs |resid| px by kf (oldest first): "
                      f"{' '.join(parts)}")
                if ur_errs:
                    ur_errs = np.asarray(ur_errs)
                    print(f"  u_R err px: bias {ur_errs.mean():+.3f} "
                          f"std {ur_errs.std():.3f} "
                          f"|err| mean {np.abs(ur_errs).mean():.3f} "
                          f"(n={len(ur_errs)})")

            def wrapped(state, cam_, cfg_, num_fixed=1):
                obs_quality(state, cam_)
                if args.gt_obs:
                    state = doctor_obs(state, cam_)
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
