"""Batched inverse-compositional patch alignment (LK) as a Pallas TPU kernel.

Why this kernel exists: the XLA version (ops/align.py) samples every patch
with 4-tap gathers — on TPU a (2000, 21, 21) bilinear gather costs ~120 ms
and the 30-iteration pyramidal LK ~5 s/frame, 99% of the tracking step
(measured; see benchmarks/). TPU gathers are the one memory pattern XLA
cannot tile; the fix is the classic pair of moves:

  1. *Window DMA*: each grid program copies one small pixel window around its
     point from HBM into VMEM once, then runs ALL iterations against VMEM.
  2. *Gather-as-roll*: bilinear sampling at a float position becomes an
     8-aligned sublane slice (pl.multiple_of) of the VMEM window, a dynamic
     sublane roll for the sub-tile row remainder, a dynamic lane roll
     (pltpu.roll) for the column shift, and a 4-tap elementwise blend for
     the bilinear fractions — pure VPU work, no matmuls. (A previous
     version built banded selection matrices and "gathered" on the MXU;
     at 2 small matmuls x 30 iters x 2000 points the kernel was issue-bound
     at ~73 ms/track — the roll path is ~20x cheaper.)

Per program: 2 window DMAs (prev + cur), 5 template samples (patch + central
-difference gradients), a 3x3 normal-matrix inverse in scalars, then `iters`
fori_loop steps of sample -> residual -> 3-vector solve -> masked update,
with the illumination-mean term of the reference's Align2D
(src/matchers/matcher.cpp:1398-1463) and cv::calcOpticalFlowPyrLK semantics
for searchByOPFlow (matcher.cpp:745).

Outputs one (1, 128) row per point: [x, y, converged, err, ...pad].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MARGIN = 12         # search slack around the init position (px, per level)
# must exceed the per-level pull-in a coarser-level failure can demand:
# at pyramid scale 0.5 a miss at level l+1 doubles at level l, so a 21 px
# window needs ~+-10 px of recoverable travel
# Window geometry: DMA slice offsets must be tile-aligned (sublane 8, lane
# 128), so bases are rounded down and the window carries the alignment slack.
WIN_LANES = 256     # window width (lane dim): 128 alignment slack + patch


def _win_rows(half: int) -> int:
    p = 2 * half + 1
    # + 8 rows of base-alignment slack + 8 so the 8-aligned slice window
    # (SLICE rows) always covers [iy, iy + P + 1] for the largest legal iy
    r = p + 2 * MARGIN + 4 + 16
    return (r + 7) // 8 * 8


def _slab_rows(half: int) -> int:
    return (2 * half + 1 + 3 + 7) // 8 * 8  # patch + blend row, 8-aligned


def _slice_rows(half: int) -> int:
    # static sublane-slice height: must cover the SLAB+1 rows the bilinear
    # taps read, plus up to 7 rows of sub-tile roll remainder
    return _slab_rows(half) + 8


PTS_PER_PROG = 8  # output block sublane requirement (>= 8) and DMA overlap.
# 16 was measured WORSE end-to-end (track 6.4 -> 7.0 ms): setup improves
# ~6% from deeper DMA overlap, but the joint per-batch exit makes every
# point iterate until the batch's slowest straggler converges, and the
# per-iteration slab extraction loop grows linearly with the batch.


def _lk_kernel(bases_ref, floats_ref, prev_hbm, cur_hbm, out_ref,
               prev_win, cur_win, sems, *, half: int, iters: int,
               conv_eps: float, height: int, width: int,
               fb_iters: int = 0):
    """Slab-batched LK: the program's PTS_PER_PROG points iterate TOGETHER.

    Per iteration, each point contributes one dynamic slab extraction
    (8-aligned sublane slice + sublane/lane rolls — inherently per-point,
    the shifts differ), but everything downstream — the 4 bilinear taps,
    the blend, residuals, the three reductions, and the 3-parameter solve —
    runs ONCE on a stacked (PTS, SLAB, 128) tensor with (PTS,)-vector
    state. The r2 kernel ran each point's full while_loop serially; the
    per-iteration instruction count was the bottleneck (~0.35 us/point-
    iteration, VPU mostly idle on (24, 128) operands). Batching trades
    per-point early exit (sum of iters) for joint exit (PTS x max iters)
    at ~6x fewer instructions per point-iteration."""
    prog = pl.program_id(0)
    P = 2 * half + 1
    SLAB = _slab_rows(half)
    WIN = prev_win.shape[1]
    PTS = PTS_PER_PROG
    PL = 128  # patch working width: one lane tile
    SLICE = _slice_rows(half)

    # start all window DMAs for this program's points up front so decode
    # latency overlaps across points
    def dma(src_ref, win, sem, by, bx):
        # host aligned the bases (rows to 8, lanes to 128); tell Mosaic
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(pl.multiple_of(by, 8), WIN),
                       pl.ds(pl.multiple_of(bx, 128), WIN_LANES)],
            win, sem)

    for j in range(PTS):
        i = prog * PTS + j
        dma(prev_hbm, prev_win.at[j], sems.at[j, 0],
            bases_ref[0, i], bases_ref[1, i]).start()
        dma(cur_hbm, cur_win.at[j], sems.at[j, 1],
            bases_ref[2, i], bases_ref[3, i]).start()

    # per-point scalars -> (PTS,) vectors
    tx_l, ty_l, ux_l, uy_l, va_l, bxc_l, byc_l = [], [], [], [], [], [], []
    for j in range(PTS):
        i = prog * PTS + j
        by_t = bases_ref[0, i]
        bx_t = bases_ref[1, i]
        by_c = bases_ref[2, i]
        bx_c = bases_ref[3, i]
        tx_l.append(floats_ref[0, i] - bx_t.astype(jnp.float32))
        ty_l.append(floats_ref[1, i] - by_t.astype(jnp.float32))
        ux_l.append(floats_ref[2, i] - bx_c.astype(jnp.float32))
        uy_l.append(floats_ref[3, i] - by_c.astype(jnp.float32))
        va_l.append(floats_ref[4, i])  # stacked as f32: bool scalar
        # vectors don't lower in Mosaic; compare after the stack
        bxc_l.append(bx_c.astype(jnp.float32))
        byc_l.append(by_c.astype(jnp.float32))
    tx = jnp.stack(tx_l)
    ty = jnp.stack(ty_l)
    ux0 = jnp.stack(ux_l)
    uy0 = jnp.stack(uy_l)
    valid = jnp.stack(va_l) > 0.5
    bx_cv = jnp.stack(bxc_l)
    by_cv = jnp.stack(byc_l)

    for j in range(PTS):
        i = prog * PTS + j
        dma(prev_hbm, prev_win.at[j], sems.at[j, 0],
            bases_ref[0, i], bases_ref[1, i]).wait()
        dma(cur_hbm, cur_win.at[j], sems.at[j, 1],
            bases_ref[2, i], bases_ref[3, i]).wait()

    prow = jax.lax.broadcasted_iota(jnp.int32, (SLAB, PL), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (SLAB, PL), 1)
    pmask3 = ((prow < P) & (pcol < P)).astype(jnp.float32)[None]

    def sample_batched(wins, u_vec, v_vec):
        # gather-free bilinear patch read, all VPU. Per point: 8-aligned
        # sublane slice -> dynamic sublane roll (sub-tile remainder) ->
        # dynamic lane roll. Then ONE batched 4-tap blend on the stacked
        # (PTS, SLICE, 256) tensor. Lane roll is cyclic but never wraps
        # into the live P+1 columns: ixc <= WIN_LANES - P - 2.
        # Index math runs per point in SCALARS: Mosaic cannot shape-cast a
        # (PTS,) lane vector into the (PTS, 1, 1) tile-batch layout, so the
        # blend weights are built by concatenating scalar-filled (1, 1, 1)
        # blocks instead.
        slabs, fxs, fys = [], [], []
        for j in range(PTS):
            vtop = v_vec[j] - half
            utop = u_vec[j] - half
            iy = jnp.floor(vtop).astype(jnp.int32)
            fy = vtop - iy.astype(jnp.float32)
            ix = jnp.floor(utop).astype(jnp.int32)
            fx = utop - ix.astype(jnp.float32)
            iyj = jnp.clip(iy, 0, WIN - SLICE)
            ixj = jnp.clip(ix, 0, WIN_LANES - P - 2)
            base = pl.multiple_of((iyj // 8) * 8, 8)
            s = wins.at[j][pl.ds(base, SLICE), :]
            s = pltpu.roll(s, -(iyj % 8), axis=0)
            s = pltpu.roll(s, -ixj, axis=1)
            slabs.append(s)
            # scalar splat to a full (SLAB, PL) tile: Mosaic cannot
            # broadcast (PTS, 1, 1) across sublanes AND lanes in one op,
            # but a scalar fill is a single native splat
            fxs.append(jnp.full((1, SLAB, PL), fx, jnp.float32))
            fys.append(jnp.full((1, SLAB, PL), fy, jnp.float32))
        X = jnp.concatenate(slabs, axis=0).reshape(PTS, SLICE, WIN_LANES)
        fx3 = jnp.concatenate(fxs, axis=0)      # (PTS, SLAB, PL)
        fy3 = jnp.concatenate(fys, axis=0)
        t00 = X[:, :SLAB, :PL]
        t01 = X[:, :SLAB, 1:PL + 1]
        t10 = X[:, 1:SLAB + 1, :PL]
        t11 = X[:, 1:SLAB + 1, 1:PL + 1]
        top = t00 + fx3 * (t01 - t00)
        bot = t10 + fx3 * (t11 - t10)
        return top + fy3 * (bot - top)          # (PTS, SLAB, PL)

    def psum2(x):
        return jnp.sum(jnp.sum(x, axis=2), axis=1)   # (PTS,)

    # template patches + gradients (inverse compositional) from ONE enlarged
    # batched sample: bilinear sampling is linear in the integer taps, so
    # sample(u+1, v) is exactly sample(u, v) shifted one column — one
    # (tx-1, ty-1)-origin sample + static shifts replaces 5 samples (valid
    # extent P+2 <= SLAB-1 rows / PL-1 cols; pads land outside pmask)
    def make_template(wins, x_vec, y_vec):
        S = sample_batched(wins, x_vec - 1.0, y_vec - 1.0)

        def shifted(dr, dc):
            # static cyclic rolls (jnp.pad does not lower in Mosaic);
            # wrapped rows/cols land at per-point indices >= P, outside
            # pmask (needs SLAB >= P + 2 and PL >= P + 2, both guaranteed
            # by _slab_rows). pltpu.roll requires non-negative static
            # shifts: roll by the cyclic complement.
            r = pltpu.roll(S, SLAB - dr, 1) if dr else S
            return pltpu.roll(r, PL - dc, 2) if dc else r

        tpl = shifted(1, 1)
        gx = 0.5 * (shifted(1, 2) - shifted(1, 0))
        gy = 0.5 * (shifted(2, 1) - shifted(0, 1))

        h00 = psum2(gx * gx * pmask3) + 1e-6
        h01 = psum2(gx * gy * pmask3)
        h02 = psum2(gx * pmask3)
        h11 = psum2(gy * gy * pmask3) + 1e-6
        h12 = psum2(gy * pmask3)
        h22 = psum2(jnp.broadcast_to(pmask3, gx.shape)) + 1e-6
        # closed-form 3x3 symmetric inverse (cofactors / det)
        c00 = h11 * h22 - h12 * h12
        c01 = h02 * h12 - h01 * h22
        c02 = h01 * h12 - h02 * h11
        c11 = h00 * h22 - h02 * h02
        c12 = h01 * h02 - h00 * h12
        c22 = h00 * h11 - h01 * h01
        det = h00 * c00 + h01 * c01 + h02 * c02
        det = jnp.where(jnp.abs(det) < 1e-10, 1e-10, det)
        inv_det = 1.0 / det
        return (tpl, gx, gy, (c00, c01, c02, c11, c12, c22, inv_det,
                              h02, h12, h22))

    tpl, gx, gy, cof = make_template(prev_win, tx, ty)
    (c00, c01, c02, c11, c12, c22, inv_det, h02, h12, h22) = cof

    lo = jnp.float32(half + 1)
    # upper bounds chosen so the slice clamp (iyc/ixc) can never engage
    # for an in-bounds position, including the +-1 gradient samples:
    # iy = floor(v+1) - half must stay <= WIN - SLICE,
    # ix = floor(u+1) - half <= WIN_LANES - P - 2
    hi_y = jnp.float32(WIN - SLICE + half - 1)
    hi_x = jnp.float32(WIN_LANES - half - 4)

    # reject points whose window clamp moved the patch off-position
    in_bounds = ((ty >= lo) & (ty <= hi_y) & (tx >= lo) & (tx <= hi_x)
                 & (uy0 >= lo) & (uy0 <= hi_y)
                 & (ux0 >= lo) & (ux0 <= hi_x))
    run = valid & in_bounds

    # loop carry uses f32 masks (1.0/0.0): Mosaic fails to legalize bool
    # vectors through the while_loop yield
    def run_lk(search_win, tplA, gxA, gyA, cofA, u_init, v_init, runf,
               n_iters):
        (a00, a01, a02, a11, a12, a22, ainv_det, ah02, ah12, ah22) = cofA

        def cond(state):
            i, u, v, md, active, failed = state
            return (i < n_iters) & (jnp.max(active) > 0.5)

        def body(state):
            i, u, v, md, active, failed = state
            cur = sample_batched(search_win, u, v)
            # the illumination term enters the normal equations as
            # sum((cur - tpl + md) g pmask) = sum((cur-tpl) g pmask)+md*h_g
            # — folding md into (PTS,)-vector math avoids materializing a
            # (PTS, SLAB, PL) broadcast tensor each iteration
            r = (cur - tplA) * pmask3
            b0 = psum2(r * gxA) + md * ah02
            b1 = psum2(r * gyA) + md * ah12
            b2 = psum2(r) + md * ah22
            du = -(a00 * b0 + a01 * b1 + a02 * b2) * ainv_det
            dv = -(a01 * b0 + a11 * b1 + a12 * b2) * ainv_det
            dm = -(a02 * b0 + a12 * b1 + a22 * b2) * ainv_det
            u_raw = u + du
            v_raw = v + dv
            # a step that leaves the window is a FAILURE, not a clamp: the
            # clamped point would sit at the window edge with a tiny step
            # and report convergence at a garbage position
            out = ((u_raw < lo) | (u_raw > hi_x)
                   | (v_raw < lo) | (v_raw > hi_y)).astype(jnp.float32)
            failed = jnp.maximum(failed, active * out)
            u_new = jnp.clip(u_raw, lo, hi_x)
            v_new = jnp.clip(v_raw, lo, hi_y)
            step2 = du * du + dv * dv
            u = u + active * (u_new - u)
            v = v + active * (v_new - v)
            md = md + active * dm
            small = (step2 < conv_eps * conv_eps).astype(jnp.float32)
            active = active * (1.0 - small) * (1.0 - failed)
            return i + 1, u, v, md, active, failed

        _, u, v, md, active, failed = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), u_init, v_init, jnp.zeros((PTS,), jnp.float32),
             runf, jnp.zeros((PTS,), jnp.float32)))
        return u, v, md, active, failed

    runf = run.astype(jnp.float32)
    u, v, md, active, failed = run_lk(cur_win, tpl, gx, gy, cof,
                                      ux0, uy0, runf, iters)
    converged = run & (active < 0.5) & (failed < 0.5)
    # mean |residual| at the solution (diagnostic output; one extra sample
    # instead of per-iteration bookkeeping). md enters as a (PTS, 1, 1)
    # concat of scalar fills, once.
    cur_f = sample_batched(cur_win, u, v)
    md3 = jnp.concatenate(
        [jnp.full((1, SLAB, PL), md[j], jnp.float32) for j in range(PTS)],
        axis=0)
    err = psum2(jnp.abs(cur_f - tpl + md3) * pmask3) / (P * P)
    err = jnp.where(run, err, 1e9)

    ox = u + bx_cv
    oy = v + by_cv
    lane = jax.lax.broadcasted_iota(jnp.int32, (PTS, WIN_LANES), 1)
    row = (jnp.where(lane == 0, ox[:, None], 0.0)
           + jnp.where(lane == 1, oy[:, None], 0.0)
           + jnp.where(lane == 2, converged.astype(jnp.float32)[:, None], 0.0)
           + jnp.where(lane == 3, err[:, None], 0.0))
    if fb_iters > 0:
        # fused forward-backward consistency check: re-track from the
        # forward solution back toward the template position using the SAME
        # two VMEM windows — template now cut from the search window at
        # (u, v), search in the template window starting at (tx, ty). A
        # separate backward kernel launch would re-pay both window DMAs and
        # the full per-point setup (~2 us/point); here it costs one extra
        # template build + fb_iters loop iterations.
        tplB, gxB, gyB, cofB = make_template(cur_win, u, v)
        ub, vb, _, activeb, failedb = run_lk(
            prev_win, tplB, gxB, gyB, cofB, tx, ty,
            converged.astype(jnp.float32), fb_iters)
        fb_conv = converged & (activeb < 0.5) & (failedb < 0.5)
        fb_d2 = (ub - tx) * (ub - tx) + (vb - ty) * (vb - ty)
        fb_d2 = jnp.where(fb_conv, fb_d2, 1e9)
        row = (row
               + jnp.where(lane == 4,
                           fb_conv.astype(jnp.float32)[:, None], 0.0)
               + jnp.where(lane == 5, fb_d2[:, None], 0.0))
    out_ref[:, :] = row


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit,
                   static_argnames=("half", "iters", "conv_eps", "interpret",
                                    "fb_iters"))
def patch_align_pallas(prev_img: jax.Array, cur_img: jax.Array,
                       pts: jax.Array, init_xy: jax.Array, valid: jax.Array,
                       half: int = 10, iters: int = 30,
                       conv_eps: float = 0.01,
                       interpret: bool = False,
                       fb_iters: int = 0):
    """Full LK for N points in one kernel launch.

    prev_img/cur_img: (H, W) float32. pts: (N, 2) template centers in prev.
    init_xy: (N, 2) starting positions in cur. Returns (xy (N, 2),
    converged (N,), err (N,)); with fb_iters > 0, additionally
    (fb_conv (N,), fb_d2 (N,)) — the fused forward-backward consistency
    check (squared pixel distance of the back-track to the template
    center; 1e9 where the back-track failed).
    """
    h, w = prev_img.shape
    N0 = pts.shape[0]
    N = _round_up(N0, PTS_PER_PROG)
    if N != N0:
        pad = N - N0
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        init_xy = jnp.pad(init_xy, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    WIN = _win_rows(half)
    hp = _round_up(max(h, WIN), 8)
    wp = _round_up(max(w, WIN_LANES + 128), 128)
    prev_p = jnp.pad(prev_img, ((0, hp - h), (0, wp - w)))
    cur_p = jnp.pad(cur_img, ((0, hp - h), (0, wp - w)))

    def base_of(xy):
        bx = jnp.round(xy[:, 0]).astype(jnp.int32) - half - MARGIN
        by = jnp.round(xy[:, 1]).astype(jnp.int32) - half - MARGIN
        bx = (bx // 128) * 128          # lane-tile alignment
        by = (by // 8) * 8              # sublane-tile alignment
        bx = jnp.clip(bx, 0, wp - WIN_LANES)
        by = jnp.clip(by, 0, hp - WIN)
        return by, bx

    by_t, bx_t = base_of(pts)
    by_c, bx_c = base_of(init_xy)
    # transposed (k, N) layout: SMEM tiles are (8, 128), so (N, k) would
    # pad every 4-wide row to 128 lanes (1 MB of SMEM at N=2000)
    bases = jnp.stack([by_t, bx_t, by_c, bx_c], axis=0)   # (4, N) int32
    floats = jnp.stack([pts[:, 0], pts[:, 1], init_xy[:, 0], init_xy[:, 1],
                        valid.astype(jnp.float32)], axis=0)  # (5, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // PTS_PER_PROG,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((PTS_PER_PROG, WIN_LANES),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PTS_PER_PROG, WIN, WIN_LANES), jnp.float32),
            pltpu.VMEM((PTS_PER_PROG, WIN, WIN_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((PTS_PER_PROG, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_lk_kernel, half=half, iters=iters,
                          conv_eps=conv_eps, height=h, width=w,
                          fb_iters=fb_iters),
        out_shape=jax.ShapeDtypeStruct((N, WIN_LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases, floats, prev_p, cur_p)
    out = out[:N0]
    valid = valid[:N0]
    xy = out[:, :2]
    converged = out[:, 2] > 0.5
    err = out[:, 3]
    # final in-image check at level resolution
    inb = ((xy[:, 0] >= half) & (xy[:, 0] < w - half)
           & (xy[:, 1] >= half) & (xy[:, 1] < h - half))
    conv = converged & inb & valid
    if fb_iters > 0:
        fb_conv = (out[:, 4] > 0.5) & conv
        fb_d2 = out[:, 5]
        return xy, conv, err, fb_conv, fb_d2
    return xy, conv, err
