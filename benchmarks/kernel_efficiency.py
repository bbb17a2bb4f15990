"""MFU / roofline accounting for the three hot kernels (VERDICT r4 next
#5): LK patch alignment, FAST+NMS, MXU Hamming. Answers BASELINE's
"speed-of-light" clause ABSOLUTELY — bytes moved and FLOPs per invocation
against chip peaks — instead of relatively (Nx a 2-core CPU canary).

Measurement discipline (the axon traps, all observed): a single dispatch's
wall time is dominated by a ~23 ms tunnel round trip, and device time
SHORTER than the round trip hides inside it — probing one call per op
measures nothing below ~23 ms. Every kernel here is therefore timed by
IN-DISPATCH REPETITION: one jitted program chains k data-dependent
invocations, and (t(k_hi) - t(k_lo)) / (k_hi - k_lo) is pure device time
(launch and fetch cancel). Outputs reduce to scalars on device.

Model (TPU v5e / "v5 lite", public spec + scaling-book arithmetic):
  * HBM bandwidth      ~ 819 GB/s
  * MXU peak           ~ 197 TFLOP/s bf16 (394 TOP/s int8)
  * VPU peak (f32 est) ~ 8x128 lanes x 4 ALUs x 2 (FMA) x ~1.5 GHz
                       ~ 12 TFLOP/s — an estimate; used only to classify
                         a kernel as issue-bound vs memory-bound.

Byte counts are HBM-side (VMEM re-reads are free in a roofline sense);
FLOP counts are analytic from the kernel shapes. "tile" FLOPs count the
padded (SLAB, 128) tiles the VPU actually processes; "useful" counts only
the algorithmic patch math — the gap is the tile-padding tax.

Usage: python benchmarks/kernel_efficiency.py
(bench.py imports measure() in-process for the BENCH extras block.)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0
MXU_TFLOPS_BF16 = 197.0
MXU_TOPS_INT8 = 394.0
VPU_TFLOPS_F32_EST = 12.0


def _lk_analytics(points: int, half: int) -> dict:
    """Per-invocation bytes; per point-iteration / per-setup FLOPs."""
    from trackingbench_slam_tpu.ops.pallas import lk_kernel as lk

    WIN = lk._win_rows(half)
    SLAB = lk._slab_rows(half)
    PL = 128
    P = 2 * half + 1
    bytes_hbm = points * (2 * WIN * lk.WIN_LANES * 4 + lk.WIN_LANES * 4)
    sample_flops = 6 * SLAB * PL          # 4-tap bilinear blend
    iter_flops = sample_flops + 7 * SLAB * PL   # + residual & 3 reductions
    setup_flops = sample_flops + 11 * SLAB * PL + 12 * SLAB * PL
    return {"bytes_hbm": bytes_hbm,
            "iter_flops_tile": iter_flops,
            "iter_flops_useful": 13 * P * P,
            "setup_flops_tile": setup_flops}


def measure(reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    out: dict = {"peaks": {"hbm_gbps": HBM_GBPS,
                           "mxu_tflops_bf16": MXU_TFLOPS_BF16,
                           "mxu_tops_int8": MXU_TOPS_INT8,
                           "vpu_tflops_f32_est": VPU_TFLOPS_F32_EST}}
    r = np.random.RandomState(0)

    def fence(x):
        np.asarray(jax.device_get(x))

    def timed(fn, *args):
        """Median wall of `reps` fenced calls (each fenced call pays one
        round trip; the k_hi - k_lo delta cancels it)."""
        fence(fn(*args))       # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fence(fn(*args))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    # ---- LK: us/point-iteration + setup via the trusted microbench -----
    from lk_microbench import measure as lk_measure
    N, half = 2000, 10
    mb = lk_measure(points=N, half=half, reps=8)
    a = _lk_analytics(N, half)
    us_it = mb["us_per_point_iteration"]
    t_iter = us_it * 1e-6                       # s per point-iteration
    t_setup = mb["us_per_point_setup_plus1"] * 1e-6  # incl. launch share
    # windows move once per invocation; attribute to the setup phase
    bytes_per_pt = a["bytes_hbm"] / N
    out["lk"] = {
        "config": f"N={N} half={half}",
        "us_per_point_iteration": us_it,
        "us_per_point_setup": mb["us_per_point_setup_plus1"],
        "iter_vpu_tflops_tile": round(
            a["iter_flops_tile"] / t_iter / 1e12, 3),
        "iter_vpu_fraction_est": round(
            a["iter_flops_tile"] / t_iter / 1e12 / VPU_TFLOPS_F32_EST, 3),
        "useful_flop_fraction": round(
            a["iter_flops_useful"] / a["iter_flops_tile"], 3),
        "setup_hbm_gb_per_s": round(bytes_per_pt / t_setup / 1e9, 1),
        "setup_hbm_fraction": round(
            bytes_per_pt / t_setup / 1e9 / HBM_GBPS, 3),
    }

    # ---- FAST + NMS: in-dispatch repetition -----------------------------
    from trackingbench_slam_tpu.ops.pallas.fast_kernel import (
        PAD, TILE_H, fast_score_map_pallas)
    h, w = 370, 1226
    img = jnp.asarray(r.rand(h, w).astype(np.float32) * 255.0)

    @jax.jit
    def fast_rep(x, k):
        # dynamic-trip fori_loop: 5-rep unrolled deltas were swamped by
        # per-dispatch noise (measured 0.05-2 ms for the same kernel);
        # ~100 chained reps put the delta well above it
        def body(i, st):
            s, cur = st
            y = fast_score_map_pallas(cur, threshold=12.0)
            s = s + jnp.sum(y)
            return s, x + s * 1e-12    # data dependency between reps
        s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x))
        return s

    t_lo = timed(lambda x: fast_rep(x, jnp.int32(8)), img)
    t_hi = timed(lambda x: fast_rep(x, jnp.int32(104)), img)
    t_fast = max((t_hi - t_lo) / 96, 1e-9)
    reread = (TILE_H + 2 * PAD) / TILE_H
    fast_bytes = h * w * 4 * (reread + 1)
    fast_flops = h * w * 145    # 24-step run-count + SAD + NMS per pixel
    out["fast"] = {
        "config": f"{h}x{w} fused detect+score+nms",
        "ms": round(t_fast * 1e3, 3),
        "hbm_gb_per_s": round(fast_bytes / t_fast / 1e9, 1),
        "hbm_fraction": round(fast_bytes / t_fast / 1e9 / HBM_GBPS, 3),
        "vpu_tflops": round(fast_flops / t_fast / 1e12, 3),
        "vpu_fraction_est": round(
            fast_flops / t_fast / 1e12 / VPU_TFLOPS_F32_EST, 3),
    }

    # ---- MXU Hamming: in-dispatch repetition ----------------------------
    from trackingbench_slam_tpu.ops.hamming import hamming_matrix_mxu
    N1 = N2 = 2048
    a8 = jnp.asarray(r.randint(0, 2, (N1, 256)).astype(np.int8) * 2 - 1)
    b8 = jnp.asarray(r.randint(0, 2, (N2, 256)).astype(np.int8) * 2 - 1)

    @jax.jit
    def ham_rep(a, b, k):
        # ONE (2048,256)x(256,2048) int8 matmul is ~5 us on the MXU — far
        # below per-dispatch noise even unrolled 9x. fori_loop with a
        # dynamic trip count chains THOUSANDS of data-dependent reps in
        # one program; the full-matrix sum is kept as the dependency (a
        # sliced sum would let XLA narrow the dot), so the measured unit
        # is matmul + full reduction — the production matching shape.
        def body(i, st):
            s, cur = st
            d = hamming_matrix_mxu(a, cur)
            s = s + jnp.sum(d)
            cur = (cur * ((d[:, :256] % 2) * 2 - 1)).astype(jnp.int8)
            return s, cur
        s, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), b))
        return s

    t_lo = timed(lambda a, b: ham_rep(a, b, jnp.int32(256)), a8, b8)
    t_hi = timed(lambda a, b: ham_rep(a, b, jnp.int32(4096)), a8, b8)
    t_ham = max((t_hi - t_lo) / 3840, 1e-9)
    ham_flops = 2 * N1 * N2 * 256
    ham_bytes = (N1 * 256 + N2 * 256) * 1 + N1 * N2 * 4
    out["hamming_mxu"] = {
        "config": f"({N1},256)x(256,{N2}) int8->int32 (+full-matrix sum)",
        "ms": round(t_ham * 1e3, 4),
        "tops_int8": round(ham_flops / t_ham / 1e12, 2),
        "mxu_fraction_int8": round(
            ham_flops / t_ham / 1e12 / MXU_TOPS_INT8, 4),
        "hbm_gb_per_s": round(ham_bytes / t_ham / 1e9, 1),
        "hbm_fraction": round(ham_bytes / t_ham / 1e9 / HBM_GBPS, 3),
        # hbm_fraction > 1 is possible: the (N1, N2) distance matrix (16 MB)
        # fits VMEM, so in fused/looped use it never round-trips HBM — the
        # byte count models the standalone-invocation worst case
        "note": "intermediate stays in VMEM when fused",
    }

    # bound classification: which wall is each kernel nearest?
    for k in ("lk", "fast", "hamming_mxu"):
        d = out[k]
        fracs = {"memory(HBM)": max(d.get("hbm_fraction", 0.0),
                                    d.get("setup_hbm_fraction", 0.0)),
                 "mxu": d.get("mxu_fraction_int8", 0.0),
                 "vpu(est)": max(d.get("vpu_fraction_est", 0.0),
                                 d.get("iter_vpu_fraction_est", 0.0))}
        d["bound"] = max(fracs, key=fracs.get)
        d["bound_fraction"] = round(max(fracs.values()), 3)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    print(json.dumps(measure(args.reps), indent=2))


if __name__ == "__main__":
    main()
