"""Batched inverse-compositional patch alignment (KLT).

One kernel family covers both of the reference's patch trackers, because their
inner loops are the same math:
  * cv::calcOpticalFlowPyrLK as used by searchByOPFlow
    (src/matchers/matcher.cpp:724-768: 21x21 window, 3+1 pyramid levels)
  * SVO-style Align2D with illumination-mean term
    (src/matchers/matcher.cpp:1366-1484: 8x8 patch, 3-param (u, v, mean_diff)
    inverse-compositional update, converge at ||delta|| < 0.03)

TPU-first: all N patches iterate together inside one lax.fori_loop — per-point
convergence becomes a mask that freezes finished points, not a branch. The
Hessian is precomputed from template gradients (inverse compositional), so the
loop body is: gather current patch (bilinear) -> residual -> two/three dot
products -> closed-form 2x2/3x3 solve -> masked update. Everything stays in
registers/VMEM; there is no data-dependent shape anywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.ops.image import bilinear_sample, extract_patches


class AlignResult(NamedTuple):
    xy: jax.Array        # (N, 2) refined positions
    converged: jax.Array  # (N,) bool
    error: jax.Array     # (N,) mean abs residual at the solution
    # forward-backward consistency (lk_pyramidal(fb_iters>0) only):
    fb_conv: jax.Array | None = None  # (N,) back-track converged
    fb_d2: jax.Array | None = None    # (N,) squared px distance of the
    #                                   back-track to the template center


def _patch_grid(half: int, dtype=jnp.float32):
    P = 2 * half + 1
    offs = jnp.arange(P, dtype=dtype) - half
    ox, oy = jnp.meshgrid(offs, offs)
    return jnp.stack([ox, oy], axis=-1)  # (P, P, 2)


def template_patches_and_grads(img: jax.Array, xy: jax.Array, half: int):
    """Gather template patches and their spatial gradients at float centers.

    Gradients are sampled from the image with central differences at the
    (possibly sub-pixel) patch positions — the same construction as the
    reference's ref_patch_with_border gradient (matcher.cpp:1389-1397).
    Returns (patches (N,P,P), grads (N,P,P,2)).
    """
    P = 2 * half + 1
    grid = _patch_grid(half, img.dtype)
    coords = xy[:, None, None, :] + grid[None]  # (N, P, P, 2)
    patches = bilinear_sample(img, coords)
    ex = jnp.array([0.5, 0.0], img.dtype)
    ey = jnp.array([0.0, 0.5], img.dtype)
    gx = bilinear_sample(img, coords + ex) - bilinear_sample(img, coords - ex)
    gy = bilinear_sample(img, coords + ey) - bilinear_sample(img, coords - ey)
    return patches, jnp.stack([gx, gy], axis=-1)


@functools.partial(jax.jit, static_argnames=("half", "iters", "with_illum"))
def align_patches(cur_img: jax.Array,
                  templates: jax.Array,
                  template_grads: jax.Array,
                  init_xy: jax.Array,
                  valid: jax.Array,
                  half: int = 4,
                  iters: int = 20,
                  conv_eps: float = 0.03,
                  with_illum: bool = True) -> AlignResult:
    """Inverse-compositional KLT for N patches at once.

    cur_img: (H, W); templates: (N, P, P); template_grads: (N, P, P, 2);
    init_xy: (N, 2) initial positions in cur_img; valid: (N,) bool.

    With `with_illum`, solves the 3-parameter system (du, dv, d_mean) exactly
    as Align2D (matcher.cpp:1398-1463); otherwise plain 2-parameter LK.
    """
    N = templates.shape[0]
    grid = _patch_grid(half, cur_img.dtype)
    gx = template_grads[..., 0]
    gy = template_grads[..., 1]
    one = jnp.ones_like(gx)

    if with_illum:
        # J = [gx, gy, 1]; H = J^T J per patch: (N, 3, 3)
        cols = (gx, gy, one)
    else:
        cols = (gx, gy)
    dim = len(cols)
    H = jnp.stack([
        jnp.stack([jnp.sum(a * b, axis=(1, 2)) for b in cols], axis=-1)
        for a in cols
    ], axis=-2)  # (N, dim, dim)
    H = H + 1e-7 * jnp.eye(dim, dtype=H.dtype)[None]
    Hinv = jnp.linalg.inv(H)

    def body(i, state):
        xy, mean_diff, active, err = state
        coords = xy[:, None, None, :] + grid[None]
        cur = bilinear_sample(cur_img, coords)  # (N, P, P)
        res = cur - templates + mean_diff[:, None, None]
        b = jnp.stack([jnp.sum(res * c, axis=(1, 2)) for c in cols], axis=-1)
        delta = -jnp.einsum("nij,nj->ni", Hinv, b)
        step_xy = delta[:, :2]
        norm2 = jnp.sum(step_xy * step_xy, axis=-1)
        upd = active[:, None]
        xy = xy + jnp.where(upd, step_xy, 0.0)
        if with_illum:
            mean_diff = mean_diff + jnp.where(active, delta[:, 2], 0.0)
        err = jnp.where(active, jnp.mean(jnp.abs(res), axis=(1, 2)), err)
        converged_now = norm2 < conv_eps * conv_eps
        active = active & ~converged_now
        return xy, mean_diff, active, err

    mean0 = jnp.zeros((N,), cur_img.dtype)
    err0 = jnp.full((N,), jnp.inf, cur_img.dtype)
    xy, mean_diff, active, err = jax.lax.fori_loop(
        0, iters, body, (init_xy, mean0, valid, err0))
    # converged = started valid and stopped iterating (or ran out with small err)
    converged = valid & ~active
    # reject walks out of the image
    h, w = cur_img.shape
    inb = ((xy[:, 0] >= half) & (xy[:, 0] < w - half)
           & (xy[:, 1] >= half) & (xy[:, 1] < h - half))
    return AlignResult(xy=xy, converged=converged & inb, error=err)


@functools.partial(jax.jit, static_argnames=("half", "iters"))
def anchored_align(atlas: jax.Array, img: jax.Array, centers: jax.Array,
                   init_xy: jax.Array, valid: jax.Array,
                   half: int = 4, iters: int = 10,
                   conv_eps: float = 0.03) -> AlignResult:
    """Align features against their landmark ANCHOR patches.

    atlas: the map's anchor-patch atlas (models/map.py); centers: (N, 2)
    atlas cell-center positions (map.atlas_cell_centers); init_xy: (N, 2)
    starting positions in `img` (the LK-tracked keypoints). The template is
    the landmark's creation-time appearance, so the refined positions carry
    no accumulated frame-to-frame drift — the observation-consistency
    requirement of windowed BA. Same inverse-compositional math as the rest
    of this module (reference Align2D, matcher.cpp:1366-1484; template
    source per FindMatchDirect, matcher.cpp:1552-1602).
    """
    from trackingbench_slam_tpu.ops.pallas.lk_kernel import patch_align_pallas

    if jax.default_backend() == "tpu":
        xy, conv, err = patch_align_pallas(atlas, img, centers, init_xy,
                                           valid, half=half, iters=iters,
                                           conv_eps=conv_eps)
        return AlignResult(xy=xy, converged=conv, error=err)
    tpl, tgrad = template_patches_and_grads(atlas, centers, half)
    return align_patches(img, tpl, tgrad, init_xy, valid, half=half,
                         iters=iters, conv_eps=conv_eps, with_illum=True)


@functools.partial(jax.jit, static_argnames=("half", "iters", "num_levels",
                                             "fb_iters"))
def lk_pyramidal(prev_pyr: tuple, cur_pyr: tuple, pts: jax.Array,
                 valid: jax.Array, scale: float,
                 half: int = 10, iters: int = 30,
                 num_levels: int = 3,
                 init_offset: jax.Array | None = None,
                 fb_iters: int = 0) -> AlignResult:
    """Pyramidal Lucas-Kanade, the searchByOPFlow engine
    (matcher.cpp:745: cv::calcOpticalFlowPyrLK(..., Size(21,21), 3)).

    prev_pyr/cur_pyr: tuples of (H_l, W_l) images, level 0 = full res.
    pts: (N, 2) level-0 positions in prev. Returns refined level-0 positions
    in cur. Coarse-to-fine over `num_levels` levels.

    init_offset ((2,) or (N, 2), level-0 px): motion prior added to the
    starting positions. With a decent prior (e.g. constant-velocity flow)
    the coarse pyramid levels become unnecessary — each level costs ~2 us
    per point in template setup alone, so callers with a prior should also
    lower num_levels.

    On TPU every level runs the fused Pallas window-DMA kernel
    (ops/pallas/lk_kernel.py) — the XLA gather path costs seconds per frame
    there; elsewhere the vectorized align_patches path is used.
    """
    from trackingbench_slam_tpu.ops.pallas.lk_kernel import patch_align_pallas

    use_pallas = jax.default_backend() == "tpu"
    levels = min(num_levels, len(prev_pyr))
    start = pts if init_offset is None else pts + init_offset
    xy = start * (scale ** (levels - 1))
    conv = valid
    err = jnp.full((pts.shape[0],), jnp.inf, pts.dtype)
    fb_conv = fb_d2 = None
    for lvl in range(levels - 1, -1, -1):
        s = scale ** lvl
        tpl_xy = pts * s
        fb_here = fb_iters if lvl == 0 else 0  # check at full res only
        if use_pallas:
            out = patch_align_pallas(
                prev_pyr[lvl], cur_pyr[lvl], tpl_xy, xy, valid,
                half=half, iters=iters, conv_eps=0.01, fb_iters=fb_here)
            if fb_here > 0:
                xy, conv, err, fb_conv, fb_d2 = out
            else:
                xy, conv, err = out
        else:
            tpl, tgrad = template_patches_and_grads(prev_pyr[lvl], tpl_xy, half)
            res = align_patches(cur_pyr[lvl], tpl, tgrad, xy, valid,
                                half=half, iters=iters, conv_eps=0.01,
                                with_illum=True)
            xy = res.xy
            err = res.error
            conv = res.converged
            if fb_here > 0:
                # XLA fallback: explicit back-track, same semantics
                tplB, tgB = template_patches_and_grads(cur_pyr[0], xy, half)
                back = align_patches(prev_pyr[0], tplB, tgB, tpl_xy, conv,
                                     half=half, iters=fb_here,
                                     conv_eps=0.01, with_illum=True)
                fb_conv = conv & back.converged
                fb_d2 = jnp.where(
                    fb_conv,
                    jnp.sum((back.xy - tpl_xy) ** 2, axis=-1), 1e9)
        if lvl > 0:
            xy = xy / scale
    return AlignResult(xy=xy, converged=conv, error=err,
                       fb_conv=fb_conv, fb_d2=fb_d2)
