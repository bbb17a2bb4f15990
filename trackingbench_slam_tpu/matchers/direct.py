"""SVO-style direct matching: sparse image alignment + feature alignment.

Replaces Matcher::searchByDirect (reference src/matchers/matcher.cpp:778-791)
and its two phases:

  * sparse_image_align  <- SparseImageAlign (matcher.cpp:883-978):
    coarse-to-fine photometric minimization of 4x4-patch residuals of the ref
    frame's landmark-bearing features w.r.t. T_cur_ref, Levenberg-Marquardt
    with precomputed reference Jacobians (PreComputeReferencePatches,
    matcher.cpp:1166-1243) and bilinear residual accumulation
    (ComputeResiduals, matcher.cpp:1070-1164).
  * features_align      <- FeaturesAlign (matcher.cpp:980-1068) +
    FindMatchDirect (matcher.cpp:1498-1620) + Align2D (matcher.cpp:1366-1484):
    project candidate landmarks into the current frame, warp an 8x8 reference
    patch by the inter-view affine, refine each with inverse-compositional
    KLT (illumination-mean term), and insert aligned features.

TPU-first: a feature batch IS the parallel axis. Phase (a)'s per-level LM loop
accumulates H, b with one einsum over all (N, 16) patch residuals — the
distributed version psums the same accumulators (the reference's per-feature
parallel_for + mutex at test/test_projection.cpp:281-287 is this reduction).
Phase (b) is one call into ops/align.align_patches over all candidates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.models.frame import FrameState
from trackingbench_slam_tpu.ops.image import bilinear_sample
from trackingbench_slam_tpu.ops.align import align_patches, template_patches_and_grads
from trackingbench_slam_tpu.utils.config import DirectConfig


class SparseAlignResult(NamedTuple):
    T_cur_ref: jax.Array
    chi2: jax.Array
    num_used: jax.Array


def _patch_offsets(half: int, dtype=jnp.float32):
    P = 2 * half
    offs = jnp.arange(P, dtype=dtype) - (half - 0.5)
    ox, oy = jnp.meshgrid(offs, offs)
    return jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (P*P, 2)


@functools.partial(jax.jit, static_argnames=("level", "iters", "patch_half", "scale_factor"))
def _align_level(cam: cam_mod.CameraParams, T0: jax.Array,
                 ref_img: jax.Array, cur_img: jax.Array,
                 p_ref: jax.Array, px_ref: jax.Array, use: jax.Array,
                 level: int, scale_factor: float,
                 iters: int = 10, patch_half: int = 2):
    """One pyramid level of sparse image alignment.

    p_ref: (N, 3) landmark positions in the REF camera frame.
    px_ref: (N, 2) their level-0 pixel coords in ref.
    use: (N,) participation mask.

    Precomputes (inverse-compositional) reference patches + Jacobians once
    (PreComputeReferencePatches, matcher.cpp:1166-1243): J_k = grad_ref(u_k)
    . d(s*pi(p))/dxi with the frame Jacobian evaluated at the ref-frame point,
    then LM-iterates: project p_cur = T p_ref, sample cur patches, solve the
    6x6, update T <- T * exp(-x) (matcher.cpp:940-944 semantics).
    """
    s = scale_factor ** level
    offsets = _patch_offsets(patch_half, ref_img.dtype)  # (K, 2)
    K = offsets.shape[0]
    uv_ref = px_ref * s  # (N, 2) at this level
    coords_ref = uv_ref[:, None, :] + offsets[None]  # (N, K, 2)
    ref_patch = bilinear_sample(ref_img, coords_ref)  # (N, K)
    ex = jnp.array([0.5, 0.0], ref_img.dtype)
    ey = jnp.array([0.0, 0.5], ref_img.dtype)
    gx = bilinear_sample(ref_img, coords_ref + ex) - bilinear_sample(ref_img, coords_ref - ex)
    gy = bilinear_sample(ref_img, coords_ref + ey) - bilinear_sample(ref_img, coords_ref - ey)
    # frame Jacobian at ref points, scaled to this level's pixels
    Jpi = cam_mod.project_jacobian(cam, p_ref) * s  # (N, 2, 6)
    J = gx[..., None] * Jpi[:, None, 0, :] + gy[..., None] * Jpi[:, None, 1, :]
    # (N, K, 6)
    w = use.astype(ref_img.dtype)
    H = jnp.einsum("nki,nkj->ij", J * w[:, None, None], J,
                   precision=jax.lax.Precision.HIGHEST)

    h, wd = cur_img.shape

    def residuals(T):
        p_cur = se3.transform_points(T, p_ref)
        uv_cur = cam_mod.world2cam(cam, p_cur) * s
        coords = uv_cur[:, None, :] + offsets[None]
        cur_patch = bilinear_sample(cur_img, coords)
        inb = ((uv_cur[:, 0] >= patch_half + 1) & (uv_cur[:, 0] < wd - patch_half - 1)
               & (uv_cur[:, 1] >= patch_half + 1) & (uv_cur[:, 1] < h - patch_half - 1)
               & (p_cur[:, 2] > 0.05))
        r = cur_patch - ref_patch  # (N, K)
        m = (w * inb.astype(ref_img.dtype))
        return r, m

    def cost(T):
        r, m = residuals(T)
        return jnp.sum(r * r * m[:, None])

    def body(i, state):
        T, lam, c = state
        r, m = residuals(T)
        b = jnp.einsum("nki,nk->i", J * m[:, None, None], r,
                       precision=jax.lax.Precision.HIGHEST)
        A = H + lam * jnp.eye(6, dtype=H.dtype)
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        x = jax.scipy.linalg.cho_solve((L, low), b)
        # inverse compositional: T <- T * exp(-x)  (matcher.cpp:943)
        T_new = se3.compose(T, se3.exp(-x))
        c_new = cost(T_new)
        accept = c_new < c
        T = jnp.where(accept, T_new, T)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        c = jnp.where(accept, c_new, c)
        return T, lam, c

    T, _, c = jax.lax.fori_loop(0, iters, body,
                                (T0, jnp.asarray(1e-4, T0.dtype), cost(T0)))
    return se3.normalize(T), c


def sparse_image_align(cam: cam_mod.CameraParams,
                       ref_pyramid: Sequence[jax.Array],
                       cur_pyramid: Sequence[jax.Array],
                       px_ref: jax.Array, depth_ref: jax.Array,
                       use: jax.Array, T_init: jax.Array,
                       cfg: DirectConfig = DirectConfig(),
                       scale_factor: float = 0.8) -> SparseAlignResult:
    """Coarse-to-fine sparse image alignment (matcher.cpp:883-978).

    px_ref: (N, 2) ref keypoint pixels (level 0); depth_ref: (N,) their
    depths in the ref camera; use: (N,) mask (features with landmarks).
    Returns T_cur_ref.
    """
    # back-project to ref camera frame
    x = (px_ref[:, 0] - cam.cx) / cam.fx
    y = (px_ref[:, 1] - cam.cy) / cam.fy
    p_ref = jnp.stack([x * depth_ref, y * depth_ref, depth_ref], axis=-1)
    use = use & (depth_ref > 1e-3)
    T = T_init
    c = jnp.asarray(0.0, jnp.float32)
    hi = min(cfg.max_level, len(ref_pyramid) - 1)
    for level in range(hi, cfg.min_level - 1, -1):
        T, c = _align_level(cam, T, ref_pyramid[level], cur_pyramid[level],
                            p_ref, px_ref, use, level, scale_factor,
                            iters=cfg.sparse_iters, patch_half=cfg.patch_half)
    return SparseAlignResult(T_cur_ref=T, chi2=c, num_used=jnp.sum(use))


class FeatureAlignResult(NamedTuple):
    px_cur: jax.Array     # (C, 2) refined level-0 positions in cur
    level: jax.Array      # (C,) search level used
    ok: jax.Array         # (C,) aligned successfully
    err: jax.Array        # (C,) residual


@functools.partial(jax.jit, static_argnames=("num_levels", "scale_factor", "cfg"))
def features_align(cam: cam_mod.CameraParams,
                   cur: FrameState,
                   ref_pyramid: Sequence[jax.Array],
                   T_ref_w: jax.Array,
                   cand_pos_w: jax.Array, cand_px_ref: jax.Array,
                   cand_valid: jax.Array,
                   cfg: DirectConfig = DirectConfig(),
                   num_levels: int = 5,
                   scale_factor: float = 0.8,
                   cand_level: jax.Array | None = None) -> FeatureAlignResult:
    """Align candidate landmarks into the current frame against ONE reference
    keyframe (FeaturesAlign + FindMatchDirect, matcher.cpp:980-1068,
    1498-1620).

    The reference loops over ~10 covisible keyframes picking each point's
    closest-view observation; here the host calls this once per reference
    keyframe with the candidate subset whose close-view obs lives there
    (map.get_close_view_obs provides the split) — same math, batched per
    source image.

    cand_pos_w: (C, 3) world positions; cand_px_ref: (C, 2) their observed
    pixel in the ref keyframe (level 0); cand_valid: (C,); cand_level: (C,)
    the ref feature's own pyramid level — templates are warped from THAT
    level's image (the reference samples ref_ftr->level at
    matcher.cpp:1552-1602; sampling level 0 for a coarse-level feature
    aliases under large scale change). None means all level 0.
    """
    half = cfg.align_patch_half  # 4 -> 8x8 patch
    T_cur_w = cur.T_cw
    T_cur_ref = se3.compose(T_cur_w, se3.inverse(T_ref_w))

    # depths in ref camera
    p_ref = se3.transform_points(T_ref_w, cand_pos_w)
    depth_ref = p_ref[:, 2]
    # project into cur
    p_cur = se3.transform_points(T_cur_w, cand_pos_w)
    px_cur0 = cam_mod.world2cam(cam, p_cur)  # (C, 2) level-0 initial guess
    vis = cand_valid & (depth_ref > 0.05) & (p_cur[:, 2] > 0.05) \
        & cam_mod.is_in_frame(cam, px_cur0, boundary=half + 2)

    # --- affine warp A_cur_ref per candidate (matcher.cpp:1519-1538):
    # project ref-pixel offsets (halfpatch, 0) and (0, halfpatch) at the
    # candidate's ref depth into cur, finite-difference the projection.
    d = float(half + 1)

    def project_ref_offset(off):
        px = cand_px_ref + off[None, :]
        xn = (px[:, 0] - cam.cx) / cam.fx
        yn = (px[:, 1] - cam.cy) / cam.fy
        p = jnp.stack([xn * depth_ref, yn * depth_ref, depth_ref], axis=-1)
        return cam_mod.world2cam(cam, se3.transform_points(T_cur_ref, p))

    base = project_ref_offset(jnp.zeros(2, jnp.float32))
    du = (project_ref_offset(jnp.array([d, 0.0], jnp.float32)) - base) / d
    dv = (project_ref_offset(jnp.array([0.0, d], jnp.float32)) - base) / d
    A = jnp.stack([du, dv], axis=-1)  # (C, 2, 2) cur-pixels per ref-pixel

    # --- search level by warp determinant (GetBestSearchLevel,
    # matcher.cpp:1541-1550): pick the level where |det(A)| * s^2 ~ 1
    detA = jnp.abs(A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
    lvls = jnp.arange(num_levels, dtype=jnp.float32)
    s_all = scale_factor ** lvls  # (L,)
    score = jnp.abs(detA[:, None] * (s_all ** 2)[None, :] - 1.0)
    search_level = jnp.argmin(score, axis=-1)  # (C,)
    s = jnp.power(jnp.asarray(scale_factor), search_level.astype(jnp.float32))

    # --- warp the ref patch: for each cur-level patch pixel offset o,
    # ref pixel = px_ref + A^{-1} (o / s)   (reference warps with
    # A_ref_cur = A_cur_ref^{-1}, matcher.cpp:1552-1602)
    detA_safe = jnp.where(detA < 1e-8, 1e-8, A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0])
    Ainv = jnp.stack([
        jnp.stack([A[:, 1, 1], -A[:, 0, 1]], axis=-1),
        jnp.stack([-A[:, 1, 0], A[:, 0, 0]], axis=-1),
    ], axis=-2) / detA_safe[:, None, None]
    P = 2 * half + 1
    Pb = P + 2  # 1-px border for patch-local gradients
    offs_b = jnp.arange(Pb, dtype=jnp.float32) - half - 1.0
    oxb, oyb = jnp.meshgrid(offs_b, offs_b)
    grid_b = jnp.stack([oxb, oyb], axis=-1).reshape(-1, 2)  # (Pb*Pb, 2)
    # cur-search-level offsets -> ref level-0 offsets
    ref_offs0 = jnp.einsum("cij,kj->cki", Ainv, grid_b) / s[:, None, None]
    C = cand_pos_w.shape[0]
    if cand_level is None:
        cand_level = jnp.zeros((C,), jnp.int32)
    # warp the bordered template from the ref feature's OWN pyramid level
    # (matcher.cpp:1567-1592: patch_ptr indexes img at ref_ftr->level)
    tpl_b = jnp.zeros((C, Pb * Pb), jnp.float32)
    for rl in range(num_levels):
        s_rl = scale_factor ** rl
        coords_rl = (cand_px_ref[:, None, :] + ref_offs0) * s_rl
        t = bilinear_sample(ref_pyramid[rl], coords_rl)
        tpl_b = jnp.where((cand_level == rl)[:, None], t, tpl_b)
    tpl_b = tpl_b.reshape(C, Pb, Pb)
    tpl = tpl_b[:, 1:-1, 1:-1]
    # gradients from the warped patch itself, central differences over the
    # CUR search-level pixel step (ref_patch_with_border construction,
    # matcher.cpp:1389-1397) — units match the Align2D update axis
    tgx = 0.5 * (tpl_b[:, 1:-1, 2:] - tpl_b[:, 1:-1, :-2])
    tgy = 0.5 * (tpl_b[:, 2:, 1:-1] - tpl_b[:, :-2, 1:-1])
    tgrad = jnp.stack([tgx, tgy], axis=-1)

    # --- Align2D at the search level. All candidates share the padded
    # level-0 cur image sampled at level scale (equivalent to sampling the
    # level image; avoids ragged per-level gathers).
    # We instead align on the actual level image per level group, iterating
    # levels statically and merging by mask.
    px = px_cur0
    ok = jnp.zeros_like(cand_valid)
    err = jnp.full((cand_pos_w.shape[0],), jnp.inf, jnp.float32)
    out_px = px_cur0
    for lvl in range(num_levels):
        sel = vis & (search_level == lvl)
        s_l = scale_factor ** lvl
        init = px_cur0 * s_l
        res = align_patches(cur.pyramid[lvl], tpl, tgrad, init, sel,
                            half=half, iters=cfg.align_iters,
                            conv_eps=cfg.conv_eps, with_illum=True)
        out_px = jnp.where(sel[:, None], res.xy / s_l, out_px)
        ok = jnp.where(sel, res.converged, ok)
        err = jnp.where(sel, res.error, err)
    # final displacement sanity: refined position near the projection
    drift = jnp.linalg.norm(out_px - px_cur0, axis=-1)
    ok = ok & (drift < 10.0)
    return FeatureAlignResult(px_cur=out_px, level=search_level, ok=ok, err=err)
