"""LK kernel microbenchmark: us/point-iteration and us/point template setup.

    python benchmarks/lk_microbench.py [--points 2000] [--half 10]

Measures the Pallas kernel (ops/pallas/lk_kernel.py) at a fixed iteration
count (conv_eps=0 disables early exit so the iteration cost is exact), then
at iters=0-equivalent (iters=1) to separate template-setup cost. Prints one
JSON line for BENCH extras.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(points: int = 2000, half: int = 10, reps: int = 20) -> dict:
    """In-process measurement (bench.py calls this directly: a subprocess
    pays ~150 s of remote-backend init before any work)."""
    import types
    args = types.SimpleNamespace(points=points, half=half, reps=reps)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trackingbench_slam_tpu.ops.pallas.lk_kernel import patch_align_pallas

    h, w = 370, 1226
    r = np.random.RandomState(0)
    img1 = r.rand(h, w).astype(np.float32) * 255.0
    # smooth it a bit so gradients are sane
    img1 = (img1[:-2, :-2] + img1[1:-1, :-2] + img1[2:, :-2]
            + img1[:-2, 1:-1] + img1[1:-1, 1:-1] + img1[2:, 1:-1]
            + img1[:-2, 2:] + img1[1:-1, 2:] + img1[2:, 2:]) / 9.0
    img2 = np.roll(img1, (1, 2), (0, 1))
    N = args.points
    pts = np.stack([r.uniform(30, img1.shape[1] - 30, N),
                    r.uniform(30, img1.shape[0] - 30, N)], -1).astype(
        np.float32)
    valid = np.ones(N, bool)
    im1, im2 = jnp.asarray(img1), jnp.asarray(img2)
    validj = jnp.asarray(valid)
    ptsj = jnp.asarray(pts)

    # the axon runtime caches identical dispatches and its block_until_ready
    # returns immediately (see .claude/skills/verify/SKILL.md). CHAIN the
    # calls through a data dependency (output xy -> next init_xy) so every
    # rep executes; each chained dispatch pays a ~16 ms round trip that
    # CANCELS in the iters=25 minus iters=1 delta.
    def run(iters, eps):
        out = patch_align_pallas(im1, im2, ptsj, ptsj, validj,
                                 half=args.half, iters=iters, conv_eps=eps)
        np.asarray(jax.device_get(out[0]))
        init = ptsj
        t0 = time.time()
        for _ in range(args.reps):
            xy, conv, err = patch_align_pallas(
                im1, im2, ptsj, init, validj, half=args.half,
                iters=iters, conv_eps=eps)
            # data dependency with content-distinct values (~0.001 px) so
            # neither buffer-identity nor content caching can skip the rep,
            # while iteration counts stay comparable across reps
            init = ptsj + err[:, None] * 1e-3
        np.asarray(jax.device_get(init))
        return (time.time() - t0) / args.reps

    # conv_eps=0 -> no early exit -> exact iteration counts. Each config
    # runs twice and keeps the second (remote-session warmup shows up in
    # whichever config goes first otherwise).
    run(1, 0.0)
    t1 = run(1, 0.0)
    run(25, 0.0)
    t25 = run(25, 0.0)
    us_per_pt_iter = (t25 - t1) / (24 * N) * 1e6
    us_setup = t1 / N * 1e6  # template + 1 iteration + launch
    # realistic: early exit on, 30 iters budget
    t_real = run(30, 0.01)
    return {
        "platform": jax.devices()[0].platform,
        "points": N, "half": args.half,
        "us_per_point_iteration": round(us_per_pt_iter, 4),
        "us_per_point_setup_plus1": round(us_setup, 3),
        "ms_track_realistic": round(t_real * 1e3, 3),
        "ms_iters25": round(t25 * 1e3, 3), "ms_iters1": round(t1 * 1e3, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=2000)
    p.add_argument("--half", type=int, default=10)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(measure(args.points, args.half, args.reps)))


if __name__ == "__main__":
    sys.exit(main())
