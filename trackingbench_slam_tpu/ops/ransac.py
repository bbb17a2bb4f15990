"""Batched 8-point fundamental-matrix RANSAC.

Replaces cv::findFundamentalMat(FM_RANSAC, 3.0, 0.99) as used by
Matcher::rejectWithF (reference src/matchers/matcher.cpp:853-881) to prune
optical-flow matches.

TPU-first: all S hypothesis samples run as one batch — S x (8-point normal
equations -> 9x9 eigh null space -> rank-2 projection) via vmap, then one
(S, N) epipolar-distance matrix picks the best model. Static sample count,
no early exit: the whole RANSAC is a single fused program, which on TPU is
faster than adaptive iteration for any realistic S.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _normalize_points(pts: jax.Array):
    """Hartley normalization: center + mean dist sqrt(2)."""
    mean = jnp.mean(pts, axis=0)
    d = jnp.mean(jnp.linalg.norm(pts - mean, axis=-1)) + 1e-9
    s = jnp.sqrt(2.0) / d
    T = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], pts.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (pts - mean) * s, T


def _chol_unrolled(A: jax.Array, n: int):
    """Unrolled Cholesky factor of a small SPD matrix as Python lists of
    scalars — fuses into the surrounding program (lax.linalg on tiny
    matrices is a standalone blocked kernel with ~100us launch latency,
    and vmapping 256 of them dominated the RANSAC)."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_apply(L, b, n: int) -> jax.Array:
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


def _min_eigvec(M: jax.Array, iters: int = 4) -> jax.Array:
    """Smallest eigenvector of a small symmetric PSD matrix via inverse
    iteration: factor (M + eps*I) once with an unrolled Cholesky, then a few
    triangular solves. Converges at rate lambda_min/lambda_2 — 3-4 rounds
    suffice even for near-degenerate eight-point systems."""
    n = M.shape[-1]
    eps = 1e-7 * (jnp.trace(M) + 1e-12)
    A = M + eps * jnp.eye(n, dtype=M.dtype)
    L = _chol_unrolled(A, n)
    v = jnp.ones((n,), M.dtype) / jnp.sqrt(jnp.float32(n))
    for _ in range(iters):
        w = _chol_apply(L, v, n)
        v = w / jnp.maximum(jnp.linalg.norm(w), 1e-20)
    return v


def _eight_point(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """F from >= 8 correspondences (p1, p2: (K, 2), normalized). Returns (3,3).
    Null vector via power iteration on A^T A; rank-2 enforced by removing
    the smallest singular direction (F <- F - (F v3) v3^T)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones],
                  axis=-1)  # (K, 9)
    AtA = jnp.dot(A.T, A, precision=jax.lax.Precision.HIGHEST)
    f = _min_eigvec(AtA)
    F = f.reshape(3, 3)
    # rank-2: v3 = right singular vector of the smallest singular value
    v3 = _min_eigvec(jnp.dot(F.T, F, precision=jax.lax.Precision.HIGHEST))
    return F - jnp.outer(F @ v3, v3)


def _sampson_epipolar_dist(F: jax.Array, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Symmetric epipolar (point-to-line) distance, cv2-compatible gating."""
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)  # (N, 3)
    h2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=-1)
    l2 = h1 @ F.T  # epipolar lines in image 2
    l1 = h2 @ F
    d2 = jnp.abs(jnp.sum(h2 * l2, axis=-1)) / jnp.maximum(
        jnp.linalg.norm(l2[:, :2], axis=-1), 1e-9)
    d1 = jnp.abs(jnp.sum(h1 * l1, axis=-1)) / jnp.maximum(
        jnp.linalg.norm(l1[:, :2], axis=-1), 1e-9)
    return jnp.maximum(d1, d2)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def fundamental_ransac(p1: jax.Array, p2: jax.Array, valid: jax.Array,
                       key: jax.Array, threshold: float = 3.0,
                       num_samples: int = 256):
    """p1, p2: (N, 2) correspondences; valid: (N,) bool. Returns
    (inlier_mask (N,), F_best (3, 3)).

    Sampling: weighted-without-replacement via Gumbel top-k over valid
    entries, per hypothesis. Degenerate samples produce bad models that
    simply lose the inlier vote.
    """
    N = p1.shape[0]
    p1n, T1 = _normalize_points(jnp.where(valid[:, None], p1, 0.0))
    p2n, T2 = _normalize_points(jnp.where(valid[:, None], p2, 0.0))

    logits = jnp.where(valid, 0.0, -1e9)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (num_samples, N), minval=1e-9, maxval=1.0) + 1e-12))
    _, sample_idx = jax.lax.top_k(logits[None, :] + gumbel, 8)  # (S, 8)

    def one_model(idx):
        return _eight_point(p1n[idx], p2n[idx])

    Fs = jax.vmap(one_model)(sample_idx)  # (S, 3, 3)
    # score in pixel space: denormalize F = T2^T Fn T1
    F_px = jnp.einsum("ji,sjk,kl->sil", T2, Fs, T1)

    def score(F):
        d = _sampson_epipolar_dist(F, p1, p2)
        inl = (d < threshold) & valid
        return jnp.sum(inl)

    votes = jax.vmap(score)(F_px)
    best = jnp.argmax(votes)
    F_best = F_px[best]
    d = _sampson_epipolar_dist(F_best, p1, p2)
    inliers = (d < threshold) & valid
    # guard: if everything degenerates, keep original matches
    enough = votes[best] >= 8
    inliers = jnp.where(enough, inliers, valid)
    return inliers, F_best
