"""Motion-only bundle adjustment: batched Levenberg-Marquardt on SE(3).

Replaces the reference's g2o stack for LocalBA::PoseOptimization
(src/mapping/LocalBA.cpp:291-490): one VertexSE3Expmap + N unary
EdgeSE3ProjectXYZOnlyPose edges, Huber(sqrt(5.991)), 4 rounds x 10 LM
iterations with chi2 > 5.991 outlier gating between rounds (outliers excluded
next round but re-tested every round), Levenberg lambda0 = 1e-4, dense 6x6
solve. Unlike the reference, intrinsics come from the camera model rather than
being hardcoded to KITTI (the LocalBA.cpp:356-359 bug is not replicated).

TPU-first design: the whole edge set is a fixed-capacity batch. One LM
iteration = project all points (vmapped), Huber IRLS weights, reduce
(N, 6, 6) outer products to a 6x6 normal system (einsum -> psum-compatible),
Cholesky solve, left-multiplicative exp update. Outlier gating is a weight
mask, not graph surgery. The per-device partial-reduction structure makes the
distributed version (parallel/) a one-line psum.

Accumulation is float32 with the normal equations formed in f64-free
compensated style: for the 2000-edge operating point f32 is sufficient (H
entries ~1e6); solvers/schur.py documents the mixed-precision reasoning for
the windowed case.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.utils.config import SolverConfig


class PoseOptResult(NamedTuple):
    T_cw: jax.Array      # (4, 4) optimized pose
    inliers: jax.Array   # (N,) bool final chi2 gate
    num_inliers: jax.Array
    chi2: jax.Array      # (N,) final per-edge chi2 (unweighted by Huber)


def _residuals(cam, T_cw, pts_w, obs_px):
    pc = se3.transform_points(T_cw, pts_w)
    proj = cam_mod.world2cam(cam, pc)
    r = obs_px - proj  # (N, 2)
    return r, pc


def _chi2(r, inv_sigma2):
    return jnp.sum(r * r, axis=-1) * inv_sigma2


def _huber_weight(chi2: jax.Array, delta: float) -> jax.Array:
    """IRLS weight for Huber on the sigma-normalized error norm e = sqrt(chi2):
    w = 1 for e <= delta, delta / e beyond (g2o RobustKernelHuber semantics)."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)


def _normal_equations(cam, T_cw, pts_w, obs_px, inv_sigma2, weight_mask,
                      huber_delta: float | None):
    """Build (H (6,6), b (6,), cost) for the current linearization. The
    returned cost is the robust total at THIS state — the single-sweep LM
    loop below uses it as the trial-point evaluation, so one residual pass
    serves both roles (the r4 version ran a separate cost-only sweep)."""
    r, pc = _residuals(cam, T_cw, pts_w, obs_px)
    behind = pc[..., 2] <= 0.05
    chi2 = _chi2(r, inv_sigma2)
    w = inv_sigma2 * weight_mask * jnp.where(behind, 0.0, 1.0)
    if huber_delta is not None:
        w = w * _huber_weight(chi2, huber_delta)
    J = cam_mod.project_jacobian(cam, pc)  # (N, 2, 6) = d proj / d xi
    # dr/dxi = -J ; GN: (J^T W J) dx = J^T W r  (signs cancel)
    Jw = J * w[:, None, None]
    H = jnp.einsum("nij,nik->jk", Jw, J,
                   precision=jax.lax.Precision.HIGHEST)
    b = jnp.einsum("nij,ni->j", Jw, r,
                   precision=jax.lax.Precision.HIGHEST)
    chi2m = jnp.where(behind, 0.0, chi2)
    rho = chi2m if huber_delta is None else _huber_rho(chi2m, huber_delta)
    cost = jnp.sum(jnp.where(weight_mask > 0, rho, 0.0))
    return H, b, cost


def _huber_rho(chi2: jax.Array, delta: float) -> jax.Array:
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, chi2, 2.0 * delta * e - delta * delta)


def _chol6_solve(A, b):
    """Unrolled 6x6 SPD Cholesky solve in plain scalar ops.

    lax.linalg.cholesky on a 6x6 is a standalone blocked kernel with ~100us
    of launch latency on TPU; 40 LM iterations paid it 40 times. Unrolled,
    the solve fuses into the surrounding program and costs ~100 scalar ops."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _solve_damped(H, b, lam):
    A = H + lam * jnp.eye(6, dtype=H.dtype)
    return _chol6_solve(A, b)


@functools.partial(jax.jit, static_argnames=("iters", "huber_delta"))
def lm_pose_iterations(cam, T0, pts_w, obs_px, inv_sigma2, mask,
                       iters: int, huber_delta: float | None,
                       init_lambda: float = 1e-4):
    """Fixed-count LM loop with accept/reject (rho-free, chi2-compare — the
    same accept rule g2o's Levenberg uses in practice for this problem).

    Single-sweep: (H, b) ride the loop carry; the build at the trial point
    doubles as its cost evaluation (one residual pass per iteration, not
    two). A rejected step keeps the carried (T, H, b) — they belong to the
    unmoved state — and only raises lambda."""
    maskf = mask.astype(T0.dtype)

    def build(T):
        return _normal_equations(cam, T, pts_w, obs_px, inv_sigma2,
                                 maskf, huber_delta)

    def body(i, state):
        T, lam, cost, H, b = state
        dx = _solve_damped(H, b, lam)
        T_new = se3.compose(se3.exp(dx), T)
        H_t, b_t, cost_new = build(T_new)
        accept = cost_new < cost
        T = jnp.where(accept, T_new, T)
        H = jnp.where(accept, H_t, H)
        b = jnp.where(accept, b_t, b)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        cost = jnp.where(accept, cost_new, cost)
        return T, lam, cost, H, b

    H0, b0, cost0 = build(T0)
    T, lam, cost, _, _ = jax.lax.fori_loop(
        0, iters, body, (T0, jnp.asarray(init_lambda, T0.dtype),
                         cost0, H0, b0))
    return se3.normalize(T), cost


@functools.partial(jax.jit, static_argnames=("config",))
def pose_optimization(cam: cam_mod.CameraParams, T_init: jax.Array,
                      pts_w: jax.Array, obs_px: jax.Array,
                      inv_sigma2: jax.Array, valid: jax.Array,
                      config: SolverConfig = SolverConfig()) -> PoseOptResult:
    """The full 4-round scheme of LocalBA::PoseOptimization.

    pts_w: (N, 3) landmark positions; obs_px: (N, 2) keypoint observations;
    inv_sigma2: (N,) per-observation information (scale-level weights,
    LocalBA.cpp:367); valid: (N,) bool edge mask.

    Round structure (LocalBA.cpp:420-479): optimize 10 iters, re-test every
    edge's chi2 against 5.991, drop outliers for the next round (they can
    re-enter if their chi2 recovers), drop the Huber kernel in the final
    round. Returns the pose and the final inlier set.
    """
    inlier = valid

    T = T_init
    for rnd in range(config.rounds):
        delta = config.huber_delta if rnd < config.rounds - 1 else None
        T, _ = lm_pose_iterations(cam, T, pts_w, obs_px, inv_sigma2, inlier,
                                  iters=config.iters_per_round,
                                  huber_delta=delta,
                                  init_lambda=config.init_lambda)
        r, pc = _residuals(cam, T, pts_w, obs_px)
        chi2 = _chi2(r, inv_sigma2)
        inlier = valid & (chi2 <= config.chi2_threshold) & (pc[..., 2] > 0.05)

    r, pc = _residuals(cam, T, pts_w, obs_px)
    chi2 = _chi2(r, inv_sigma2)
    return PoseOptResult(T_cw=T, inliers=inlier,
                         num_inliers=jnp.sum(inlier), chi2=chi2)


def level_inv_sigma2(levels: jax.Array, scale_factor: float) -> jax.Array:
    """Per-level information weights: keypoints detected at pyramid level l
    (coords rescaled to level 0) carry sigma = (1/scale)^l px, so
    inv_sigma2 = scale^(2l) (the reference's mvInvLevelSigma2, Frame.h/
    LocalBA.cpp:367 — with its 1.2 scale replaced by our pyramid factor)."""
    return jnp.power(jnp.asarray(scale_factor, jnp.float32) ** 2,
                     levels.astype(jnp.float32))
