"""Two-view triangulation, batched.

Replaces LocalBA::LinearTriangle (reference src/mapping/LocalBA.cpp:24-43),
which builds the 4x4 DLT system from two projection rows per view and takes
the smallest-singular-vector — note the reference has a missing-return bug
there (LocalBA.cpp:42-43); we implement the intended math.

Also provides midpoint triangulation from bearing vectors (closed form, no
SVD — much cheaper on TPU and what the batched mapping path uses) and
stereo depth from disparity (reference LocalBA.cpp:46-68: depth = bf / |du|).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(P1: jax.Array, P2: jax.Array, px1: jax.Array, px2: jax.Array) -> jax.Array:
    """DLT triangulation.

    P1, P2: (3, 4) projection matrices (K [R|t]).
    px1, px2: (..., 2) pixel observations.
    Returns (..., 3) world points.

    Same construction as LocalBA.cpp:29-38: rows u*P.row2 - P.row0 and
    v*P.row2 - P.row1 for each view; solution = smallest right singular
    vector, dehomogenized. Implemented eigendecomposition-free for batching:
    we solve the 4x4 symmetric system via eigh of A^T A.
    """

    def rows(P, px):
        u, v = px[..., 0:1], px[..., 1:2]
        r0 = u * P[2] - P[0]  # (..., 4)
        r1 = v * P[2] - P[1]
        return r0, r1

    a0, a1 = rows(P1, px1)
    a2, a3 = rows(P2, px2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (..., 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, v = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = v[..., :, 0]  # smallest
    wcoord = X[..., 3]
    wsafe = jnp.where(jnp.abs(wcoord) < 1e-12, 1e-12, wcoord)
    return X[..., :3] / wsafe[..., None]


def triangulate_midpoint(T_w1: jax.Array, T_w2: jax.Array,
                         f1: jax.Array, f2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Midpoint triangulation from unit bearings in two camera frames.

    T_w1/T_w2: (4, 4) camera-to-world poses. f1/f2: (..., 3) unit bearings in
    each camera frame. Returns (points_world (..., 3), valid (...,)) where
    valid requires positive depths in both views and non-degenerate parallax.
    """
    c1 = T_w1[:3, 3]
    c2 = T_w2[:3, 3]
    d1 = f1 @ T_w1[:3, :3].T  # world-frame directions
    d2 = f2 @ T_w2[:3, :3].T
    # Solve [d1 -d2] [s; t] = c2 - c1 in least squares (2x2 normal equations)
    b = c2 - c1
    a11 = jnp.sum(d1 * d1, axis=-1)
    a12 = -jnp.sum(d1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    b1 = jnp.sum(d1 * b, axis=-1)
    b2 = -jnp.sum(d2 * b, axis=-1)
    det = a11 * a22 - a12 * a12
    detsafe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (a22 * b1 - a12 * b2) / detsafe
    t = (a11 * b2 - a12 * b1) / detsafe
    p1 = c1 + s[..., None] * d1
    p2 = c2 + t[..., None] * d2
    mid = 0.5 * (p1 + p2)
    valid = (s > 1e-6) & (t > 1e-6) & (jnp.abs(det) > 1e-10)
    return mid, valid


def stereo_depth(cam_bf: jax.Array, u_left: jax.Array, u_right: jax.Array,
                 min_disp: float = 0.5) -> tuple[jax.Array, jax.Array]:
    """Rectified-stereo depth from horizontal pixel offset.

    Reference: LocalBA.cpp:54-66 — after LK-matching left->right keypoints,
    depth = bf / (uL - uR), keeping only positive disparities.
    Returns (depth, valid).
    """
    disp = u_left - u_right
    valid = disp > min_disp
    dsafe = jnp.where(jnp.abs(disp) < 1e-6, 1e-6, disp)
    return cam_bf / dsafe, valid


def backproject(cam_fx: jax.Array, cam_fy: jax.Array, cam_cx: jax.Array,
                cam_cy: jax.Array, px: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels + depth -> camera-frame 3D points (..., 3)."""
    x = (px[..., 0] - cam_cx) / cam_fx * depth
    y = (px[..., 1] - cam_cy) / cam_fy * depth
    return jnp.stack([x, y, depth], axis=-1)
