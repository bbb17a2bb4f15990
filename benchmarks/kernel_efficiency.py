"""MFU / roofline accounting for the three hot kernels (VERDICT r4 next
#5): LK patch alignment, FAST+NMS, MXU Hamming. Answers BASELINE's
"speed-of-light" clause ABSOLUTELY — bytes moved and FLOPs per invocation
against chip peaks — instead of relatively (Nx a 2-core CPU canary).

Model (TPU v5e / "v5 lite", public spec + scaling-book arithmetic):
  * HBM bandwidth      ~ 819 GB/s
  * MXU peak           ~ 197 TFLOP/s bf16 (394 TOP/s int8)
  * VPU peak (f32 est) ~ 8x128 lanes x 4 ALUs x 2 (FMA) x ~1.5 GHz
                       ~ 12 TFLOP/s — an estimate; used only to classify
                         a kernel as issue-bound vs memory-bound.

Byte counts are HBM-side (VMEM re-reads are free in a roofline sense);
FLOP counts are analytic from the kernel shapes, counting only arithmetic
the algorithm requires (masked/pad lanes EXCLUDED, so the numbers are
honest algorithmic throughput, not hardware-busy throughput).

Usage: python benchmarks/kernel_efficiency.py [--cpu]
(bench.py imports measure() in-process for the BENCH extras block.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0
MXU_TFLOPS_BF16 = 197.0
MXU_TOPS_INT8 = 394.0
VPU_TFLOPS_F32_EST = 12.0


def _lk_analytics(points: int, half: int, iters: int) -> dict:
    """Per-invocation bytes / FLOPs of patch_align_pallas (fb_iters=0)."""
    from trackingbench_slam_tpu.ops.pallas import lk_kernel as lk

    WIN = lk._win_rows(half)
    SLAB = lk._slab_rows(half)
    PL = 128
    P = 2 * half + 1
    # HBM traffic: two (WIN, 256) f32 window DMAs per point + one
    # (1, 256) f32 output row + the scalar tables (negligible)
    bytes_hbm = points * (2 * WIN * lk.WIN_LANES * 4 + lk.WIN_LANES * 4)
    # FLOPs per sample_batched per point: 4-tap bilinear blend = 6 flops
    # over (SLAB, PL); residual+3 masked reductions ~ 7 ops over (SLAB, PL);
    # 3-vector solve ~ 30 scalar flops (negligible)
    sample_flops = 6 * SLAB * PL
    iter_flops = sample_flops + 7 * SLAB * PL
    # template: one enlarged sample + 5 shifted combines + 6 reductions
    setup_flops = sample_flops + 11 * SLAB * PL + 6 * 2 * SLAB * PL
    flops = points * (setup_flops + iters * iter_flops)
    # algorithmic (useful) flops only touch the P x P patch, not the padded
    # (SLAB, PL) tile — report both so the tile-padding tax is visible
    useful = points * ((6 + 7) * P * P * iters + 20 * P * P)
    return {"bytes_hbm": bytes_hbm, "flops_tile": flops,
            "flops_useful": useful}


def measure(reps: int = 8) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    out: dict = {"peaks": {"hbm_gbps": HBM_GBPS,
                           "mxu_tflops_bf16": MXU_TFLOPS_BF16,
                           "vpu_tflops_f32_est": VPU_TFLOPS_F32_EST}}

    def drain(x):
        np.asarray(jax.device_get(x))

    def timed(fn, arglists):
        outs = [fn(*a) for a in arglists]
        for o in outs:
            drain(jax.tree_util.tree_leaves(o)[0])
        t0 = time.time()
        outs = [fn(*a) for a in arglists]
        for o in outs:
            drain(jax.tree_util.tree_leaves(o)[0])
        return (time.time() - t0) / len(arglists)

    # launch overhead baseline (identical-dispatch caching is defeated by
    # distinct pre-uploaded inputs)
    r = np.random.RandomState(0)
    toys = [(jnp.asarray(r.rand(8, 128).astype(np.float32)),)
            for _ in range(reps)]
    t_launch = timed(jax.jit(lambda x: x.sum() + 1.0), toys)

    # ---- LK: hi-lo over iterations isolates the iteration loop ----------
    from trackingbench_slam_tpu.ops.pallas.lk_kernel import patch_align_pallas
    h, w, N, half = 370, 1226, 2000, 10
    img1 = r.rand(h, w).astype(np.float32) * 255.0
    img2 = np.roll(img1, (1, 2), (0, 1))
    im1, im2 = jnp.asarray(img1), jnp.asarray(img2)
    ptss = [jnp.asarray(np.stack(
        [r.uniform(30, w - 30, N), r.uniform(30, h - 30, N)],
        -1).astype(np.float32)) for _ in range(reps)]
    validj = jnp.ones((N,), bool)

    def lk_run(iters):
        return timed(
            lambda p: patch_align_pallas(im1, im2, p, p, validj, half=half,
                                         iters=iters, conv_eps=0.0)[0],
            [(p,) for p in ptss])

    t1 = lk_run(1)
    t25 = lk_run(25)
    t_iter24 = t25 - t1
    a25 = _lk_analytics(N, half, 25)
    a1 = _lk_analytics(N, half, 1)
    lk_bytes = a25["bytes_hbm"]           # same windows either way
    out["lk"] = {
        "config": f"N={N} half={half} iters=25",
        "ms": round(t25 * 1e3, 3),
        "hbm_gb_per_s": round(lk_bytes / t25 / 1e9, 1),
        "hbm_fraction": round(lk_bytes / t25 / 1e9 / HBM_GBPS, 3),
        "vpu_tflops_tile": round(a25["flops_tile"] / t25 / 1e12, 3),
        "vpu_fraction_est": round(
            a25["flops_tile"] / t25 / 1e12 / VPU_TFLOPS_F32_EST, 3),
        "useful_flop_fraction": round(
            a25["flops_useful"] / a25["flops_tile"], 3),
        "iter_loop_vpu_tflops_tile": round(
            (a25["flops_tile"] - a1["flops_tile"]) / max(t_iter24, 1e-9)
            / 1e12, 3),
    }

    # ---- FAST + NMS -----------------------------------------------------
    from trackingbench_slam_tpu.ops.pallas.fast_kernel import (
        fast_score_map_pallas)
    imgs = [jnp.asarray(r.rand(h, w).astype(np.float32) * 255.0)
            for _ in range(reps)]
    t_fast = max(timed(lambda x: fast_score_map_pallas(x, threshold=12.0),
                       [(x,) for x in imgs]) - t_launch, 1e-9)
    # HBM: stripes re-read halos (TILE_H+2*PAD rows per TILE_H) + score out
    from trackingbench_slam_tpu.ops.pallas.fast_kernel import PAD, TILE_H
    reread = (TILE_H + 2 * PAD) / TILE_H
    fast_bytes = h * w * 4 * (reread + 1)
    # per pixel: 16 taps x (2 cmp + 2 select/count) for the doubled-seq run
    # count over 24 steps ~ 24 x 4 ops + SAD 16 x 2 + NMS 8 x 2 ~ 145 ops
    fast_flops = h * w * 145
    out["fast"] = {
        "config": f"{h}x{w} fused detect+score+nms",
        "ms": round(t_fast * 1e3, 3),
        "hbm_gb_per_s": round(fast_bytes / t_fast / 1e9, 1),
        "hbm_fraction": round(fast_bytes / t_fast / 1e9 / HBM_GBPS, 3),
        "vpu_tflops_tile": round(fast_flops / t_fast / 1e12, 3),
        "vpu_fraction_est": round(
            fast_flops / t_fast / 1e12 / VPU_TFLOPS_F32_EST, 3),
    }

    # ---- MXU Hamming ----------------------------------------------------
    from trackingbench_slam_tpu.ops.hamming import hamming_matrix_mxu
    N1 = N2 = 2048
    descs = [(jnp.asarray(r.randint(0, 2, (N1, 256)).astype(np.int8) * 2 - 1),
              jnp.asarray(r.randint(0, 2, (N2, 256)).astype(np.int8) * 2 - 1))
             for _ in range(reps)]
    t_ham = max(timed(lambda a, b: hamming_matrix_mxu(a, b), descs)
                - t_launch, 1e-9)
    ham_flops = 2 * N1 * N2 * 256            # int8 MACs
    ham_bytes = (N1 * 256 + N2 * 256) * 1 + N1 * N2 * 4
    out["hamming_mxu"] = {
        "config": f"({N1},256)x(256,{N2}) int8->int32",
        "ms": round(t_ham * 1e3, 3),
        "tops_int8": round(ham_flops / t_ham / 1e12, 2),
        "mxu_fraction_int8": round(
            ham_flops / t_ham / 1e12 / MXU_TOPS_INT8, 4),
        "hbm_gb_per_s": round(ham_bytes / t_ham / 1e9, 1),
        "hbm_fraction": round(ham_bytes / t_ham / 1e9 / HBM_GBPS, 3),
    }

    # bound classification: which wall is each kernel nearest?
    for k in ("lk", "fast", "hamming_mxu"):
        d = out[k]
        fracs = {"memory(HBM)": d.get("hbm_fraction", 0.0),
                 "mxu": d.get("mxu_fraction_int8", 0.0),
                 "vpu(est)": d.get("vpu_fraction_est", 0.0)}
        d["bound"] = max(fracs, key=fracs.get)
        d["bound_fraction"] = round(max(fracs.values()), 3)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(measure(args.reps), indent=2))


if __name__ == "__main__":
    main()
