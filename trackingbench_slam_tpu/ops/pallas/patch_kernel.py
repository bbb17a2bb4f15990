"""Keypoint patch extraction as a Pallas kernel + gather-free ORB math.

The ORB stage's cost on TPU is pure gather: IC-angle reads a 31x31 patch per
keypoint (ops/orb.py ic_angle) and rBRIEF samples 512 rotated positions per
keypoint (brief_descriptors) — both lower to scalar-ish XLA gathers. The
restructuring here:

  1. `extract_patches32` (Pallas): one window DMA per keypoint (tile-aligned
     bases + pl.multiple_of, as in lk_kernel.py) and two one-hot selection
     matmuls shift the window so each keypoint yields its exact 32x32
     integer-aligned patch. Output (N, 32, 128) with the patch in lanes
     [:32].
  2. IC angle: dense masked moment reduction over the patch batch — no
     gathers (ops/orb.py math, same circular mask).
  3. rBRIEF: rotation is quantized to ANGLE_BINS discrete angles; each bin's
     rotated 256-pair sample positions become a STATIC 0/1 selection matrix.
     All bins stack into one (1024, BINS * 512) matrix, so descriptor
     sampling for the whole keypoint batch is ONE MXU matmul
     (N, 1024) x (1024, BINS*512), followed by a one-hot bin contraction.
     Angle quantization (11.25 deg at 32 bins) is within rBRIEF's design
     tolerance — the original ORB paper itself quantizes the learned pattern
     to 12 deg increments (2 pi / 30).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trackingbench_slam_tpu.ops.orb import (PATCH_HALF, _circle_umax_mask,
                                            brief_pattern, pack_bits)

PATCH = 32           # output patch size (covers the 31x31 ORB patch)
WIN_ROWS = 48        # 32 + 8 alignment slack + borders
WIN_LANES = 256      # 128 alignment slack + patch
ANGLE_BINS = 32


def _patch_kernel(bases_ref, prev_hbm, out_ref, win, sem):
    """One keypoint per program: DMA the window, one-hot-shift to the patch.

    bases_ref: (3, N) int32 [by_aligned, bx_aligned, in_bounds];
    out_ref: (1, PATCH, 128); win: (WIN_ROWS, WIN_LANES) scratch."""
    i = pl.program_id(0)
    by = bases_ref[0, i]
    bx = bases_ref[1, i]
    oy = bases_ref[2, i]  # patch-top offset within window (rows)
    ox = bases_ref[3, i]  # patch-left offset within window (lanes)

    pltpu.make_async_copy(
        prev_hbm.at[pl.ds(pl.multiple_of(by, 8), WIN_ROWS),
                    pl.ds(pl.multiple_of(bx, 128), WIN_LANES)],
        win, sem).start()
    pltpu.make_async_copy(
        prev_hbm.at[pl.ds(pl.multiple_of(by, 8), WIN_ROWS),
                    pl.ds(pl.multiple_of(bx, 128), WIN_LANES)],
        win, sem).wait()

    w = win[...]
    # rows: one-hot (PATCH, WIN_ROWS) selecting rows oy..oy+PATCH-1
    rr = jax.lax.broadcasted_iota(jnp.int32, (PATCH, WIN_ROWS), 0)
    rk = jax.lax.broadcasted_iota(jnp.int32, (PATCH, WIN_ROWS), 1)
    Sy = (rk == (rr + oy)).astype(jnp.float32)
    rows = jnp.dot(Sy, w, preferred_element_type=jnp.float32)  # (PATCH, 256)
    # cols: one-hot (WIN_LANES, 128) mapping lane ox+c -> c
    cr = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, 128), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, 128), 1)
    Sx = (cr == (ck + ox)).astype(jnp.float32)
    patch = jnp.dot(rows, Sx, preferred_element_type=jnp.float32)
    out_ref[0] = patch


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_patches32(img: jax.Array, centers: jax.Array, valid: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """(N, PATCH, 128) float patches; patch top-left = round(center)-15.
    Lanes [PATCH:] are padding. Out-of-image keypoints yield clamped-window
    garbage — callers must mask on `valid` and border distance."""
    h, w = img.shape
    N = centers.shape[0]
    hp = _round_up(max(h, WIN_ROWS), 8)
    wp = _round_up(max(w, WIN_LANES + 128), 128)
    img_p = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    cx = jnp.round(centers[:, 0]).astype(jnp.int32)
    cy = jnp.round(centers[:, 1]).astype(jnp.int32)
    top = cy - (PATCH // 2 - 1)   # 31-patch top at center-15
    left = cx - (PATCH // 2 - 1)
    by = jnp.clip((top - 4) // 8 * 8, 0, hp - WIN_ROWS)
    bx = jnp.clip((left - 4) // 128 * 128, 0, wp - WIN_LANES)
    oy = jnp.clip(top - by, 0, WIN_ROWS - PATCH)
    ox = jnp.clip(left - bx, 0, WIN_LANES - PATCH)
    bases = jnp.stack([by, bx, oy, ox], axis=0)  # (4, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, PATCH, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_ROWS, WIN_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _patch_kernel,
        out_shape=jax.ShapeDtypeStruct((N, PATCH, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases, img_p)


# --------------------------------------------------------------------------
# dense ORB math over extracted patches


@functools.lru_cache(maxsize=1)
def _moment_masks():
    """(32, 32) circular mask and x/y coordinate grids centered at (15, 15)."""
    m = np.zeros((PATCH, PATCH), np.float32)
    m[:31, :31] = _circle_umax_mask()
    ys, xs = np.mgrid[0:PATCH, 0:PATCH].astype(np.float32)
    xs = xs - 15.0
    ys = ys - 15.0
    return m, xs * m, ys * m


def ic_angle_from_patches(patches: jax.Array) -> jax.Array:
    """(N, 32, >=32) patches -> (N,) IC angle. Same moments as
    ops.orb.ic_angle (reference ORBextractor.cpp:17-44), zero gathers."""
    m, xm, ym = _moment_masks()
    p = patches[:, :, :PATCH]
    m10 = jnp.einsum("nij,ij->n", p, jnp.asarray(xm))
    m01 = jnp.einsum("nij,ij->n", p, jnp.asarray(ym))
    return jnp.arctan2(m01, m10)


@functools.lru_cache(maxsize=4)
def _brief_selection_matrix(bins: int = ANGLE_BINS) -> np.ndarray:
    """(1024, bins * 512) static 0/1 matrix: column (b * 512 + 2k + which)
    selects the rounded rotated sample position of pattern point `which` of
    pair k at angle bin b, flattened into the 32x32 patch."""
    pat = brief_pattern().astype(np.float64)  # (256, 2, 2)
    S = np.zeros((PATCH * PATCH, bins * 512), np.float32)
    for b in range(bins):
        ang = 2 * np.pi * b / bins
        ca, sa = np.cos(ang), np.sin(ang)
        for k in range(256):
            for which in range(2):
                x, y = pat[k, which]
                rx = int(round(x * ca - y * sa)) + 15
                ry = int(round(x * sa + y * ca)) + 15
                rx = min(max(rx, 0), PATCH - 1)
                ry = min(max(ry, 0), PATCH - 1)
                S[ry * PATCH + rx, b * 512 + 2 * k + which] = 1.0
    return S


def brief_from_patches(patches: jax.Array, angles: jax.Array,
                       valid: jax.Array) -> jax.Array:
    """(N, 32, >=32) blurred patches + (N,) angles -> (N, 8) uint32.

    One (N, 1024) x (1024, BINS*512) MXU matmul samples every rotated test
    point for every angle bin; a one-hot bin contraction picks each
    keypoint's bin. HIGHEST precision: descriptor bits are comparisons of
    pixel values, bf16 rounding would flip near-ties."""
    N = patches.shape[0]
    S = jnp.asarray(_brief_selection_matrix())
    flat = patches[:, :, :PATCH].reshape(N, PATCH * PATCH)
    allbins = jax.lax.dot_general(
        flat, S, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # (N, BINS*512)
    allbins = allbins.reshape(N, ANGLE_BINS, 512)
    two_pi = 2.0 * jnp.pi
    bin_idx = jnp.round(jnp.mod(angles, two_pi) / two_pi * ANGLE_BINS
                        ).astype(jnp.int32) % ANGLE_BINS
    onehot = jax.nn.one_hot(bin_idx, ANGLE_BINS, dtype=patches.dtype)
    samples = jnp.einsum("nb,nbk->nk", onehot, allbins)  # (N, 512)
    pa = samples[:, 0::2]
    pb = samples[:, 1::2]
    bits = (pa < pb).astype(jnp.uint32)
    bits = jnp.where(valid[:, None], bits, 0)
    return pack_bits(bits)
