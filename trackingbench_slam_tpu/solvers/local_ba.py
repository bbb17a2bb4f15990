"""Windowed local bundle adjustment via Schur complement — the full
g2o+Cholmod replacement.

The reference only ships motion-only BA (solvers/pose_opt.py covers it) and
lists windowed BA as the obvious extension its g2o dependency exists for
(BlockSolver_6_3 *is* the pose/landmark Schur structure,
src/mapping/LocalBA.cpp:293-304). This module implements it TPU-first:

  * The observation set is a flat fixed-capacity batch (obs_kf, obs_lm,
    obs_px, weights, valid) — no graph objects.
  * One GN/LM iteration: vmapped residuals + Jacobians for every observation,
    scatter-add into block accumulators
        U (K,6,6)   pose diagonal blocks
        V (M,3,3)   landmark diagonal blocks
        Wb (M,K,6,3) pose-landmark coupling (dense over the window — K is
                    small, so the "sparse" W of CPU solvers is a small dense
                    tensor here, which is exactly what the MXU wants)
        bp (K,6), bl (M,3)
  * Schur: S = U - W V^-1 W^T, reduced rhs; one dense (6K,6K) Cholesky; then
    back-substitute landmarks with batched 3x3 solves.
  * Gauge: the first window pose is clamped (rows/cols of its block pinned
    to identity), matching the convention of fixing the first keyframe.

Precision: accumulation in f32 with Precision.HIGHEST (the TPU would
otherwise run these einsums in bf16; g2o used f64 — HIGHEST f32 plus LM
damping is sufficient at window scale, verified against scipy f64 in tests).

Distribution: build_ba_blocks is the per-shard computation; the distributed
BA in parallel/dist_ba.py shards observations/landmarks across devices and
psums (U, bp) + keeps (V, W, bl) local to the landmark shard — see
parallel/dist_ba.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.solvers.pose_opt import _huber_weight, _huber_rho

HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Fixed-capacity window: K poses, M landmarks, O observations.

    obs_ur (optional): right-image u coordinate per observation for
    rectified-stereo BA — adds the ORB-SLAM2-style third residual row
    u_R - (u' - bf/z), which pins per-keyframe scale (a mono-only window
    with one clamped pose has a free scale gauge). -1 marks a mono
    observation; None disables the stereo rows entirely."""

    T_cw: jax.Array        # (K, 4, 4)
    points: jax.Array      # (M, 3)
    obs_kf: jax.Array      # (O,) int32 in [0, K)
    obs_lm: jax.Array      # (O,) int32 in [0, M)
    obs_px: jax.Array      # (O, 2)
    obs_inv_sigma2: jax.Array  # (O,)
    obs_valid: jax.Array   # (O,) bool
    obs_ur: jax.Array | None = None  # (O,) right-u, -1 = mono


class BAResult(NamedTuple):
    T_cw: jax.Array
    points: jax.Array
    chi2: jax.Array        # final total robust cost
    inliers: jax.Array     # (O,) final chi2 gate


def _obs_residuals(cam, T_cw, points, p: BAProblem,
                   stereo_weight: float = 1.0):
    """Residuals + per-observation Jacobians for the full batch.

    Returns (r (O,R), pc, J (O,R,6), Jl (O,R,3), row_ok (O,R)) with R = 2
    for mono problems, 3 when stereo rows are present.

    stereo_weight scales the u_R row's weight relative to the mono rows
    (applied through row_ok, so chi2/Huber and the normal equations stay
    consistent). The u_R observation comes from stereo LK, whose disparity
    noise is larger and more structured than the anchored left-image
    observations'; weighting it 1.0 lets per-keyframe depth errors drag the
    window (measured on the bench corridor, tools/diag_ba_gap.py --no-ur)."""
    T_o = T_cw[p.obs_kf]                 # (O, 4, 4)
    X_o = points[p.obs_lm]               # (O, 3)
    R_o = T_o[:, :3, :3]
    pc = jnp.einsum("oij,oj->oi", R_o, X_o, precision=HI) + T_o[:, :3, 3]
    proj = cam_mod.world2cam(cam, pc)
    r = p.obs_px - proj                  # (O, 2)
    J = cam_mod.project_jacobian(cam, pc)   # (O, 2, 6) d proj/d xi
    row_ok = jnp.ones(r.shape, r.dtype)
    if p.obs_ur is not None:
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        ur_pred = proj[:, 0] - cam.bf / zs
        r_ur = p.obs_ur - ur_pred
        # d z / d xi for a left-multiplied increment: [0, 0, 1, y, -x, 0]
        Jz = jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x),
                        jnp.ones_like(x), y, -x, jnp.zeros_like(x)],
                       axis=-1)
        J_ur = J[:, 0, :] + (cam.bf / (zs * zs))[:, None] * Jz
        r = jnp.concatenate([r, r_ur[:, None]], axis=-1)       # (O, 3)
        J = jnp.concatenate([J, J_ur[:, None, :]], axis=1)     # (O, 3, 6)
        row_ok = jnp.concatenate(
            [row_ok,
             stereo_weight * (p.obs_ur >= 0).astype(r.dtype)[:, None]],
            axis=-1)
    # landmark Jacobian: d row / d X_w = (d row / d pc) . R, and the
    # translation columns of J ARE d row / d pc (left-mult convention)
    Jl = jnp.einsum("oij,ojk->oik", J[:, :, :3], R_o, precision=HI)
    return r, pc, J, Jl, row_ok


def _obs_chi2(r, row_ok, inv_sigma2):
    return jnp.sum(r * r * row_ok, axis=-1) * inv_sigma2


def build_ba_blocks(cam, T_cw, points, p: BAProblem,
                    huber_delta: float | None, stereo_weight: float = 1.0):
    """Per-shard block accumulation (the psum unit for distributed BA)."""
    K = T_cw.shape[0]
    M = points.shape[0]
    r, pc, J, Jl, row_ok = _obs_residuals(cam, T_cw, points, p,
                                          stereo_weight)
    chi2 = _obs_chi2(r, row_ok, p.obs_inv_sigma2)
    w = p.obs_inv_sigma2 * p.obs_valid * (pc[:, 2] > 0.05)
    if huber_delta is not None:
        w = w * _huber_weight(chi2, huber_delta)
    W = w[:, None] * row_ok                  # (O, R) per-row weights
    Jw = J * W[:, :, None]
    Jlw = Jl * W[:, :, None]
    U = jnp.zeros((K, 6, 6)).at[p.obs_kf].add(
        jnp.einsum("oij,oik->ojk", Jw, J, precision=HI))
    V = jnp.zeros((M, 3, 3)).at[p.obs_lm].add(
        jnp.einsum("oij,oik->ojk", Jlw, Jl, precision=HI))
    Wb = jnp.zeros((M, K, 6, 3)).at[p.obs_lm, p.obs_kf].add(
        jnp.einsum("oij,oik->ojk", Jw, Jl, precision=HI))
    bp = jnp.zeros((K, 6)).at[p.obs_kf].add(
        jnp.einsum("oij,oi->oj", Jw, r, precision=HI))
    bl = jnp.zeros((M, 3)).at[p.obs_lm].add(
        jnp.einsum("oij,oi->oj", Jlw, r, precision=HI))
    rho = chi2 if huber_delta is None else _huber_rho(chi2, huber_delta)
    cost = jnp.sum(jnp.where(p.obs_valid, rho, 0.0))
    return U, V, Wb, bp, bl, cost


def damp_diagonal(A, lam, n: int):
    """Marquardt damping: A + (lam * diag(A) + eps) I, batched over leading
    dims. Shared by the local and distributed Schur paths."""
    d = jnp.einsum("...ii->...i", A)
    return A + (lam * d + 1e-6)[..., None] * jnp.eye(n, dtype=A.dtype)


def inv3x3_sym(A):
    """Closed-form batched 3x3 inverse (adjugate / det) for the damped
    landmark blocks. jnp.linalg.inv lowers to batched LU with pivoting —
    control-flow-heavy on TPU; the damped V blocks are symmetric positive
    definite, so the cofactor formula is exact and pure VPU math. Matches
    the 3x3 inverse the LK kernel already uses (ops/pallas/lk_kernel.py)."""
    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]
    a12 = A[..., 1, 2]
    a22 = A[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c01, c11, c12], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def schur_solve(U, V, Wb, bp, bl, lam, num_fixed: int = 1,
                fixed_mask: jax.Array | None = None):
    """Reduced camera system + landmark back-substitution.

    num_fixed poses at the start of the window are clamped (gauge: >= 1 pins
    the frame, >= 2 also pins monocular scale — the windowed analogue of
    ORB-SLAM's fixed keyframes; stereo windows can use 1).

    fixed_mask ((K,) bool, DYNAMIC) overrides num_fixed: every masked pose
    is clamped at its current estimate while its observations still
    constrain the landmarks — exactly ORB-SLAM's fixed-keyframe role in
    local BA (the neighbors outside the optimization window enter the graph
    as fixed vertices). Used by the live stage to freeze all but the newest
    `window_keyframes` ring poses, so old poses stop being re-optimized
    against long-drifted observations.

    Returns (dxi (K,6), dX (M,3))."""
    K = U.shape[0]
    M = V.shape[0]
    # Marquardt (diagonal-relative) damping + small absolute floor: block
    # magnitudes here reach ~1e8 (inv_sigma2-weighted Hessians over
    # thousands of observations), so an absolute lambda of 1e-4 is ~1e-12
    # relative — below f32 roundoff of the Schur cancellation, which can
    # leave S indefinite and the Cholesky NaN. Scaling the damping by each
    # diagonal keeps it meaningful at any problem scale.
    def damp_diag(A, n):
        return damp_diagonal(A, lam, n)

    Vd = damp_diag(V, 3)
    # batched closed-form 3x3 inverse (well-conditioned after damping;
    # landmarks with no observations get V = eps*I -> dX = bl/eps = 0)
    Vinv = inv3x3_sym(Vd)
    # S = blockdiag(U) - sum_m W_m Vinv_m W_m^T
    T1 = jnp.einsum("mkij,mjl->mkil", Wb, Vinv, precision=HI)  # (M,K,6,3)
    S_off = jnp.einsum("maij,mbkj->aibk", T1, Wb, precision=HI)  # (K,6,K,6)
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(damp_diag(U, 6))
    rhs = bp - jnp.einsum("mkij,mj->ki", T1, bl, precision=HI)  # (K,6)
    if fixed_mask is not None:
        free = 1.0 - fixed_mask.astype(S.dtype)          # (K,)
        S = S * free[:, None, None, None] * free[None, None, :, None]
        # identity diagonal on fixed blocks keeps the system non-singular
        kk = jnp.arange(K)[:, None]
        ii = jnp.arange(6)[None, :]
        S = S.at[kk, ii, kk, ii].add(fixed_mask.astype(S.dtype)[:, None])
        rhs = rhs * free[:, None]
    else:
        for f in range(num_fixed):
            # clamp pose f: identity row/col block, zero rhs
            S = S.at[f].set(0.0)
            S = S.at[:, :, f, :].set(0.0)
            S = S.at[f, jnp.arange(6), f, jnp.arange(6)].set(1.0)
            rhs = rhs.at[f].set(0.0)
    Sd = S.reshape(6 * K, 6 * K)
    L, low = jax.scipy.linalg.cho_factor(Sd, lower=True)
    dxi = jax.scipy.linalg.cho_solve((L, low), rhs.reshape(-1)).reshape(K, 6)
    if fixed_mask is not None:
        dxi = dxi * (1.0 - fixed_mask.astype(dxi.dtype))[:, None]
    # back-substitute: dX_m = Vinv_m (bl_m - sum_k W_{m,k}^T dxi_k)
    corr = jnp.einsum("mkij,ki->mj", Wb, dxi, precision=HI)  # (M,3)
    dX = jnp.einsum("mij,mj->mi", Vinv, bl - corr, precision=HI)
    return dxi, dX


class GroupedBAProblem(NamedTuple):
    """Landmark-grouped window: the observation table keeps the map's
    native (L, O) per-landmark layout instead of a flat obs list. Every
    normal-equation block then builds with DENSE one-hot einsums — the flat
    layout's 262k-row scatter-adds serialize on TPU and cost ~100 ms each,
    which made the flat path ~1 s per solve; this one is ~ms.

    obs_kf: (L, O) dense window pose ids, -1 = empty slot."""

    T_cw: jax.Array            # (K, 4, 4)
    points: jax.Array          # (L, 3)
    obs_kf: jax.Array          # (L, O) int32 in [0, K) or -1
    obs_px: jax.Array          # (L, O, 2)
    obs_inv_sigma2: jax.Array  # (L, O)
    obs_valid: jax.Array       # (L, O) bool
    obs_ur: jax.Array | None = None  # (L, O), -1 = mono


def _grouped_residuals(cam, T_cw, points, p: GroupedBAProblem,
                       stereo_weight: float = 1.0):
    """(r (L,O,R), pc, J (L,O,R,6), Jl (L,O,R,3), row_ok (L,O,R)).
    stereo_weight: see _obs_residuals."""
    K = T_cw.shape[0]
    kf = jnp.clip(p.obs_kf, 0, K - 1)
    T_o = T_cw[kf]                          # (L, O, 4, 4)
    R_o = T_o[..., :3, :3]
    pc = (jnp.einsum("loij,lj->loi", R_o, points, precision=HI)
          + T_o[..., :3, 3])
    proj = cam_mod.world2cam(cam, pc)
    r = p.obs_px - proj                      # (L, O, 2)
    J = cam_mod.project_jacobian(cam, pc)    # (L, O, 2, 6)
    row_ok = jnp.ones(r.shape, r.dtype)
    if p.obs_ur is not None:
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        r_ur = p.obs_ur - (proj[..., 0] - cam.bf / zs)
        Jz = jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x),
                        jnp.ones_like(x), y, -x, jnp.zeros_like(x)],
                       axis=-1)
        J_ur = J[..., 0, :] + (cam.bf / (zs * zs))[..., None] * Jz
        r = jnp.concatenate([r, r_ur[..., None]], axis=-1)
        J = jnp.concatenate([J, J_ur[..., None, :]], axis=-2)
        row_ok = jnp.concatenate(
            [row_ok,
             stereo_weight * (p.obs_ur >= 0).astype(r.dtype)[..., None]],
            axis=-1)
    Jl = jnp.einsum("lorj,lojk->lork", J[..., :3], R_o, precision=HI)
    return r, pc, J, Jl, row_ok


def _grouped_chi2(r, row_ok, inv_s2):
    return jnp.sum(r * r * row_ok, axis=-1) * inv_s2


def build_grouped_blocks(cam, T_cw, points, p: GroupedBAProblem,
                         huber_delta: float | None,
                         stereo_weight: float = 1.0):
    """Scatter-free block construction: pose-indexed sums go through ONE
    one-hot (L, O, K) contraction; landmark-diagonal sums reduce over the
    local O axis."""
    K = T_cw.shape[0]
    r, pc, J, Jl, row_ok = _grouped_residuals(cam, T_cw, points, p,
                                              stereo_weight)
    chi2 = _grouped_chi2(r, row_ok, p.obs_inv_sigma2)
    ok = p.obs_valid & (p.obs_kf >= 0) & (pc[..., 2] > 0.05)
    w = p.obs_inv_sigma2 * ok
    if huber_delta is not None:
        w = w * _huber_weight(chi2, huber_delta)
    W = w[..., None] * row_ok                 # (L, O, R)
    Jw = J * W[..., None]
    Jlw = Jl * W[..., None]
    onehot = jax.nn.one_hot(jnp.where(ok, p.obs_kf, K), K,
                            dtype=J.dtype)    # (L, O, K); K-index drops
    JtJ = jnp.einsum("lorj,lork->lojk", Jw, J, precision=HI)    # (L,O,6,6)
    U = jnp.einsum("lok,loij->kij", onehot, JtJ, precision=HI)  # (K,6,6)
    V = jnp.einsum("lorj,lork->ljk", Jlw, Jl, precision=HI)     # (L,3,3)
    JtJl = jnp.einsum("lorj,lork->lojk", Jw, Jl, precision=HI)  # (L,O,6,3)
    Wb = jnp.einsum("lok,loij->lkij", onehot, JtJl, precision=HI)
    Jtr = jnp.einsum("lorj,lor->loj", Jw, r, precision=HI)      # (L,O,6)
    bp = jnp.einsum("lok,loj->kj", onehot, Jtr, precision=HI)
    bl = jnp.einsum("lorj,lor->lj", Jlw, r, precision=HI)       # (L,3)
    rho = chi2 if huber_delta is None else _huber_rho(chi2, huber_delta)
    cost = jnp.sum(jnp.where(ok, rho, 0.0))
    return U, V, Wb, bp, bl, cost


@functools.partial(jax.jit, static_argnames=("iters", "huber_delta",
                                             "num_fixed", "stereo_weight"))
def bundle_adjust_grouped(cam: cam_mod.CameraParams, p: GroupedBAProblem,
                          iters: int = 10,
                          huber_delta: float | None = 2.4477,
                          init_lambda: float = 1e-4,
                          num_fixed: int = 1,
                          fixed_mask: jax.Array | None = None,
                          stereo_weight: float = 1.0):
    """LM loop over the grouped (scatter-free) blocks; same Schur solve.
    fixed_mask ((K,) bool, dynamic) overrides num_fixed — see schur_solve.
    Returns (T_cw (K,4,4), points (L,3)).

    Single-sweep LM: the normal-equation blocks live in the loop CARRY.
    Each iteration solves from the carried blocks, steps to the trial
    point, and runs ONE build there — whose returned cost IS the trial
    cost. Accept adopts the trial state AND its blocks; reject keeps the
    old blocks (they depend only on (T, X), which didn't move — the r4
    version rebuilt them anyway AND ran a separate cost-only residual
    sweep per iteration, ~2 residual sweeps per iteration instead of 1)."""

    def build(T_cw, points):
        # (build_grouped_blocks reads poses/points from its explicit args;
        # p only supplies the observation tables)
        return build_grouped_blocks(cam, T_cw, points, p, huber_delta,
                                    stereo_weight)

    def body(i, state):
        T_cw, points, lam, cost, blocks = state
        U, V, Wb, bp, bl = blocks
        dxi, dX = schur_solve(U, V, Wb, bp, bl, lam, num_fixed, fixed_mask)
        T_new = jax.vmap(lambda d, T: se3.compose(se3.exp(d), T))(dxi, T_cw)
        X_new = points + dX
        Ut, Vt, Wbt, bpt, blt, c_new = build(T_new, X_new)
        # a non-finite step must NEVER be accepted: NaN positions fall out
        # of the behind-camera cost mask, so a NaN step scores cost 0 and
        # would silently poison the whole map
        accept = ((c_new < cost) & jnp.isfinite(c_new)
                  & jnp.all(jnp.isfinite(dxi)) & jnp.all(jnp.isfinite(dX)))
        T_cw = jnp.where(accept, T_new, T_cw)
        points = jnp.where(accept, X_new, points)
        blocks = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old),
            (Ut, Vt, Wbt, bpt, blt), blocks)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 10.0, 1e8))
        cost = jnp.where(accept, c_new, cost)
        return T_cw, points, lam, cost, blocks

    U0, V0, Wb0, bp0, bl0, cost0 = build(p.T_cw, p.points)
    T_cw, points, _, _, _ = jax.lax.fori_loop(
        0, iters, body,
        (p.T_cw, p.points, jnp.asarray(init_lambda, jnp.float32),
         cost0, (U0, V0, Wb0, bp0, bl0)))
    return jax.vmap(se3.normalize)(T_cw), points


@functools.partial(jax.jit, static_argnames=("iters", "huber_delta",
                                             "num_fixed", "stereo_weight"))
def bundle_adjust(cam: cam_mod.CameraParams, problem: BAProblem,
                  iters: int = 10, huber_delta: float | None = 2.4477,
                  init_lambda: float = 1e-4,
                  num_fixed: int = 1,
                  stereo_weight: float = 1.0) -> BAResult:
    """LM loop over Schur-reduced GN steps (the windowed extension of
    LocalBA::PoseOptimization's scheme, sharing its Huber/chi2 constants)."""

    def total_cost(T_cw, points):
        r, pc, _, _, row_ok = _obs_residuals(cam, T_cw, points, problem,
                                             stereo_weight)
        chi2 = _obs_chi2(r, row_ok, problem.obs_inv_sigma2)
        chi2 = jnp.where(pc[:, 2] <= 0.05, 0.0, chi2)
        rho = chi2 if huber_delta is None else _huber_rho(chi2, huber_delta)
        return jnp.sum(jnp.where(problem.obs_valid, rho, 0.0))

    def body(i, state):
        T_cw, points, lam, cost = state
        U, V, Wb, bp, bl, _ = build_ba_blocks(cam, T_cw, points, problem,
                                              huber_delta, stereo_weight)
        dxi, dX = schur_solve(U, V, Wb, bp, bl, lam, num_fixed)
        T_new = jax.vmap(lambda d, T: se3.compose(se3.exp(d), T))(dxi, T_cw)
        X_new = points + dX
        c_new = total_cost(T_new, X_new)
        # never accept a non-finite step (see bundle_adjust_grouped)
        accept = ((c_new < cost) & jnp.isfinite(c_new)
                  & jnp.all(jnp.isfinite(dxi)) & jnp.all(jnp.isfinite(dX)))
        T_cw = jnp.where(accept, T_new, T_cw)
        points = jnp.where(accept, X_new, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 10.0, 1e8))
        cost = jnp.where(accept, c_new, cost)
        return T_cw, points, lam, cost

    T_cw, points, lam, cost = jax.lax.fori_loop(
        0, iters, body,
        (problem.T_cw, problem.points, jnp.asarray(init_lambda, jnp.float32),
         total_cost(problem.T_cw, problem.points)))
    T_cw = jax.vmap(se3.normalize)(T_cw)
    r, pc, _, _, row_ok = _obs_residuals(cam, T_cw, points, problem)
    chi2 = _obs_chi2(r, row_ok, problem.obs_inv_sigma2)
    # 2-dof gate for mono observations, 3-dof (7.815) for stereo rows
    gate = 5.991 if problem.obs_ur is None else jnp.where(
        problem.obs_ur >= 0, 7.815, 5.991)
    inliers = problem.obs_valid & (chi2 <= gate) & (pc[:, 2] > 0.05)
    return BAResult(T_cw=T_cw, points=points, chi2=cost, inliers=inliers)
