"""Fused FAST corner + score + 3x3 NMS as one Pallas TPU kernel.

This is the per-pixel hot loop the reference delegates to fast_lib's
hand-written SSE2 (absent from its tree, CMakeLists.txt:41-44) and cv::FAST
(src/extractors/ORBextractor.cpp:785-804). The XLA-composed version in
ops/fast.py materializes a (16, H, W) stack of shifted views plus ~10
full-image temporaries — every one a round trip through HBM. This kernel
touches HBM once per pixel:

  * the image stays in HBM; each grid program DMAs its row-stripe plus a
    4-row halo into VMEM scratch (overlapping stripes are exactly what
    BlockSpec can't express, hence the manual async copy)
  * 16 circle taps are static slices of the VMEM stripe
  * the circular arc test uses the doubled-sequence running-count trick:
    16+arc-1 compare/select steps track the longest contiguous run of
    brighter/darker taps — no (16, H, W) intermediate exists at any point
  * the SAD score accumulates in the same loop
  * 3x3 NMS with raster-order tie-break via 8 shifted compares of the
    stripe's score (the halo rows' scores are recomputed per stripe, so
    suppression across stripe boundaries is exact)

Stripe height is kept small (16 rows) so Mosaic's scoped-vmem stack stays
bounded: every temporary is a (16+8, Wp) tile and the unrolled 24-tap loop
keeps a few dozen of them live. (A whole-image version of this kernel
spilled 137 MB of vmem on a KITTI-sized image; 48-row stripes still
overflowed the 16 MB scoped stack — stripe size is a correctness knob for
the register allocator, not just a tuning knob.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackingbench_slam_tpu.ops.fast import CIRCLE_OFFSETS

PAD = 4  # 3 for the Bresenham circle + 1 for NMS
TILE_H = 16


def _fast_nms_kernel(img_hbm, score_ref, stripe, sem, *, threshold: float,
                     arc: int, height: int, width: int):
    """img_hbm: (Hp + 2*PAD, Wp) in ANY/HBM; score_ref: (TILE_H, Wp) VMEM;
    stripe: (TILE_H + 2*PAD, Wp) VMEM scratch."""
    i = pl.program_id(0)
    Hs, Wp = stripe.shape
    Ht = score_ref.shape[0]

    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * Ht, Hs), :], stripe, sem)
    dma.start()
    dma.wait()

    img = stripe[...]
    Wo = score_ref.shape[1]  # output width (128-aligned)

    def tap(dy, dx):
        # NMS ring needs score of rows +-1 => compute detect for Ht+2 rows
        return jax.lax.slice(img, (PAD - 1 + dy, PAD + dx),
                             (PAD - 1 + dy + Ht + 2, PAD + dx + Wo))

    center = tap(0, 0)
    run_b = jnp.zeros_like(center)
    run_d = jnp.zeros_like(center)
    best_b = jnp.zeros_like(center)
    best_d = jnp.zeros_like(center)
    sb = jnp.zeros_like(center)
    sd = jnp.zeros_like(center)
    for k in range(16 + arc - 1):
        dy, dx = CIRCLE_OFFSETS[k % 16]
        c = tap(dy, dx)
        diff = c - center
        run_b = jnp.where(diff > threshold, run_b + 1.0, 0.0)
        run_d = jnp.where(diff < -threshold, run_d + 1.0, 0.0)
        best_b = jnp.maximum(best_b, run_b)
        best_d = jnp.maximum(best_d, run_d)
        if k < 16:
            sb = sb + jnp.maximum(diff - threshold, 0.0)
            sd = sd + jnp.maximum(-diff - threshold, 0.0)
    is_corner = (best_b >= arc) | (best_d >= arc)
    score = jnp.where(is_corner, jnp.maximum(sb, sd), 0.0)  # (Ht+2, W-ish)

    # interior mask in GLOBAL image coordinates (this slab starts at global
    # row i*Ht - 1)
    row0 = i * Ht - 1
    row = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    interior = ((row >= 3) & (row < height - 3)
                & (col >= 3) & (col < width - 3))
    score = jnp.where(interior, score, 0.0)

    # 3x3 NMS over the Ht interior rows, neighbors from the slab.
    # Horizontal neighbor access uses pltpu.roll (lane rotate): the wrap-
    # around columns always carry zero (interior mask zeroes cols < 3 and
    # >= width-3 <= Wp), so a rotate is exactly a zero-padded shift here.
    def shift(dy, dx):
        rows = jax.lax.slice(score, (1 + dy, 0),
                             (1 + dy + Ht, score.shape[1]))
        if dx != 0:
            rows = pltpu.roll(rows, (-dx) % rows.shape[1], 1)
        return rows

    mid = shift(0, 0)
    suppressed = jnp.zeros(mid.shape, jnp.bool_)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = shift(dy, dx)
            if (dy < 0) or (dy == 0 and dx < 0):
                suppressed = suppressed | (neigh >= mid)
            else:
                suppressed = suppressed | (neigh > mid)
    score_ref[...] = jnp.where((mid > 0.0) & ~suppressed, mid, 0.0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("threshold", "arc", "interpret"))
def fast_score_map_pallas(img: jax.Array, threshold: float = 20.0,
                          arc: int = 9, interpret: bool = False) -> jax.Array:
    """Fused replacement for ops.fast.fast_score_map + nms3x3 (one HBM pass).

    Returns the NMS'd score map (H, W). `interpret=True` runs the Pallas
    interpreter (CPU tests)."""
    h, w = img.shape
    hp = _round_up(h, TILE_H)
    wo = _round_up(w, 128)        # output width, lane-aligned
    ws = wo + 128                 # stripe width: room for the +-PAD taps
    img_p = jnp.pad(img, ((PAD, PAD + hp - h), (PAD, ws - w - PAD)))

    grid = (hp // TILE_H,)
    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, threshold=threshold, arc=arc,
                          height=h, width=w),
        out_shape=jax.ShapeDtypeStruct((hp, wo), img.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE_H, wo), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * PAD, ws), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(img_p)
    return out[:h, :w]
