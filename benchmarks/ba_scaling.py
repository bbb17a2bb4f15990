"""BA iters/s + weak-scaling measurement (BASELINE.md's missing metric).

Prints ONE JSON line: {"devices": N, "landmarks": L, "iters_per_s": X,
"ms_per_iter": Y}.

Usage (bench.py drives these):
  # real accelerator, production problem size:
  python benchmarks/ba_scaling.py --landmarks 4096
  # weak scaling on virtual CPU devices (landmarks per shard constant):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/ba_scaling.py --devices 8 --landmarks 4096 --cpu

Per-iteration cost is measured as (t(iters_hi) - t(iters_lo)) /
(iters_hi - iters_lo) over N independent pre-uploaded problems with one
drain — the axon measurement discipline (block_until_ready returns
immediately for remote arrays; identical dispatches are cached).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(devices: int = 1, landmarks: int = 4096, keyframes: int = 16,
            obs: int = 16, reps: int = 4, iters_lo: int = 2,
            iters_hi: int = 12) -> dict:
    """In-process measurement on the CURRENT backend (bench.py calls this
    for the device number; the virtual-CPU weak-scaling runs stay
    subprocesses because XLA device-count flags bind at backend init)."""
    import types
    args = types.SimpleNamespace(devices=devices, landmarks=landmarks,
                                 keyframes=keyframes, obs=obs, reps=reps,
                                 iters_lo=iters_lo, iters_hi=iters_hi)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from trackingbench_slam_tpu.geometry import se3
    from trackingbench_slam_tpu.geometry import camera as cam_mod
    from trackingbench_slam_tpu.parallel import dist_ba, mesh as mesh_mod
    from trackingbench_slam_tpu.solvers import local_ba
    from trackingbench_slam_tpu.utils.config import CameraConfig

    cam = cam_mod.CameraParams.from_config(
        CameraConfig(width=1226, height=370, fx=707.0, fy=707.0,
                     cx=613.0, cy=185.0, bf=707.0 * 0.54))
    K, L, O = args.keyframes, args.landmarks, args.obs
    rng = np.random.RandomState(0)

    def make_problem(seed):
        r = np.random.RandomState(seed)
        T_cw = []
        for k in range(K):
            xi = np.concatenate([[0.1 * k, 0, 0], r.randn(3) * 0.005])
            T_cw.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
        T_cw = np.stack(T_cw)
        X = r.uniform(-8, 8, (L, 3)).astype(np.float32)
        X[:, 2] = r.uniform(4, 40, L)
        kf = np.tile(np.arange(K, dtype=np.int32)[None, :O] % K, (L, 1))
        Rm = np.stack([t[:3, :3] for t in T_cw])
        tm = np.stack([t[:3, 3] for t in T_cw])
        pc = np.einsum("kij,lj->lki", Rm, X) + tm[None]     # (L, K, 3)
        pc = np.take_along_axis(pc, kf[..., None], axis=1)  # (L, O, 3)
        px = np.stack([pc[..., 0] / pc[..., 2] * 707.0 + 613.0,
                       pc[..., 1] / pc[..., 2] * 707.0 + 185.0], axis=-1)
        return local_ba.GroupedBAProblem(
            T_cw=jnp.asarray(T_cw, jnp.float32),
            points=jnp.asarray(X + r.randn(L, 3).astype(np.float32) * 0.05),
            obs_kf=jnp.asarray(kf),
            obs_px=jnp.asarray(px.astype(np.float32)),
            obs_inv_sigma2=jnp.ones((L, O), jnp.float32),
            obs_valid=jnp.asarray(np.ones((L, O), bool)))

    problems = [make_problem(s) for s in range(args.reps)]
    mesh = mesh_mod.make_mesh(lm=args.devices) if args.devices > 1 else None

    def solve(gp, iters):
        if mesh is not None:
            return dist_ba.distributed_bundle_adjust_grouped(
                mesh, cam, gp, iters=iters, num_fixed=1)
        return local_ba.bundle_adjust_grouped(cam, gp, iters=iters,
                                              num_fixed=1)

    def timed(iters):
        outs = [solve(gp, iters) for gp in problems]    # compile + warm
        for T, X in outs:
            np.asarray(jax.device_get(T))
        t0 = time.time()
        outs = [solve(gp, iters) for gp in problems]
        for T, X in outs:
            np.asarray(jax.device_get(T))
        return (time.time() - t0) / len(problems)

    t_lo = timed(args.iters_lo)
    t_hi = timed(args.iters_hi)
    per_iter = max((t_hi - t_lo) / (args.iters_hi - args.iters_lo), 1e-9)
    return {
        "devices": args.devices,
        "platform": jax.devices()[0].platform,
        "landmarks": L, "keyframes": K, "obs_per_landmark": O,
        "ms_per_iter": round(per_iter * 1000, 3),
        "iters_per_s": round(1.0 / per_iter, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--landmarks", type=int, default=4096)
    p.add_argument("--keyframes", type=int, default=16)
    p.add_argument("--obs", type=int, default=16)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--iters-lo", type=int, default=2)
    p.add_argument("--iters-hi", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                        f"{args.devices}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(measure(args.devices, args.landmarks, args.keyframes,
                             args.obs, args.reps, args.iters_lo,
                             args.iters_hi)))


if __name__ == "__main__":
    main()
