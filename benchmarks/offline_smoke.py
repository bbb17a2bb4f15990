"""One-off TPU smoke for the offline whole-sequence scan (VERDICT r4 next
#3: models/offline.py never had a recorded TPU number — bench.py always ran
it last and the budget was spent). Runs offline_scan_bench on the cached
bench frames and prints its dict, so the compile cost and fps are known
BEFORE the driver's budgeted bench run.

    python benchmarks/offline_smoke.py [--frames 40]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from bench import build_config, render_frames, offline_scan_bench

    cfg, baseline = build_config()
    frames, gt = render_frames(cfg, baseline, args.frames)
    t0 = time.time()
    out = offline_scan_bench(cfg, frames)
    out["wall_incl_compile_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
