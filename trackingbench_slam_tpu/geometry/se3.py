"""SE(3) Lie group operations as pure JAX functions.

Replaces Sophus::SE3d as used by the reference for pose state and
exponential-map updates (reference: src/matchers/matcher.cpp:943
``T_cur_from_ref = Sophus::SE3d::exp(-x) * T_cur_from_ref``; g2o
VertexSE3Expmap in src/mapping/LocalBA.cpp:309-315).

Representation: a pose is a (4, 4) float array (rotation block + translation
column). Tangent vectors are (6,) with translation part first, rotation part
last: xi = [rho(3), phi(3)] — the same ordering g2o's SE3Quat::exp uses, so
Jacobian layouts match the reference's JacobianXYZ2uv (include/types/Frame.h:
132-156).

All functions are shape-polymorphic over leading batch dims via vmap and safe
at phi -> 0 (Taylor fallbacks), so they can sit inside jit/scan/Pallas-adjacent
code with no data-dependent branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# TPU lowers f32 matmuls to bf16 passes by default; geometry needs full f32.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def hat(v: jax.Array) -> jax.Array:
    """so(3) hat operator: (3,) -> (3, 3) skew-symmetric."""
    zero = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([zero, -v[2], v[1]]),
        jnp.stack([v[2], zero, -v[0]]),
        jnp.stack([-v[1], v[0], zero]),
    ])


def vee(m: jax.Array) -> jax.Array:
    """Inverse of hat: (3, 3) -> (3,)."""
    return jnp.stack([m[2, 1], m[0, 2], m[1, 0]])


def _sinc_terms(theta2: jax.Array):
    """Numerically safe (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    Double-where construction: the non-Taylor branch is evaluated at a SAFE
    theta2 so its derivative is finite even when unused — a plain where()
    still propagates NaN/garbage gradients from the untaken branch, which
    silently broke autodiff of exp/log at the identity (the pose-graph
    Jacobians came out NaN)."""
    small = theta2 < 1e-6
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (t - jnp.sin(t)) / (t2 * t))
    return a, b, c


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: (3,) axis-angle -> (3, 3) rotation."""
    theta2 = jnp.dot(phi, phi)
    a, b, _ = _sinc_terms(theta2)
    K = hat(phi)
    return jnp.eye(3, dtype=phi.dtype) + a * K + b * _mm(K, K)


def so3_log(R: jax.Array) -> jax.Array:
    """(3, 3) rotation -> (3,) axis-angle. Safe (value AND gradient) for
    theta in [0, pi); degrades only within ~1e-3 of pi."""
    w = vee(R - R.T) * 0.5  # = sin(theta) * axis
    w2 = jnp.dot(w, w)
    small = w2 < 1e-10
    # norm with a finite gradient at 0 (double-where: sqrt never sees 0)
    sin_theta = jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, w2)))
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)  # smooth, unlike arccos
    sin_safe = jnp.where(small, 1.0, sin_theta)
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / sin_safe)
    return scale * w


def exp(xi: jax.Array) -> jax.Array:
    """se(3) exp: (6,) [rho, phi] -> (4, 4) transform."""
    rho, phi = xi[:3], xi[3:]
    theta2 = jnp.dot(phi, phi)
    a, b, c = _sinc_terms(theta2)
    K = hat(phi)
    KK = _mm(K, K)
    R = jnp.eye(3, dtype=xi.dtype) + a * K + b * KK
    V = jnp.eye(3, dtype=xi.dtype) + b * K + c * KK
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(_mm(V, rho[:, None])[:, 0])
    return T


def log(T: jax.Array) -> jax.Array:
    """(4, 4) transform -> (6,) [rho, phi]."""
    R = T[:3, :3]
    t = T[:3, 3]
    phi = so3_log(R)
    theta2 = jnp.dot(phi, phi)
    K = hat(phi)
    # V^{-1} = I - K/2 + coef K^2, double-where safe (see _sinc_terms)
    small = theta2 < 1e-6
    th2 = jnp.where(small, 1.0, theta2)
    th = jnp.sqrt(th2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - (th * jnp.sin(th)) / (2.0 * (1.0 - jnp.cos(th)))) / th2,
    )
    Vinv = jnp.eye(3, dtype=T.dtype) - 0.5 * K + coef * _mm(K, K)
    return jnp.concatenate([_mm(Vinv, t[:, None])[:, 0], phi])


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def inverse(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-_mm(R.T, t[:, None])[:, 0])
    return Ti


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return _mm(A, B)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (4,4) T to (..., 3) points."""
    return _mm(pts, T[:3, :3].T) + T[:3, 3]


def rotate(T: jax.Array, vecs: jax.Array) -> jax.Array:
    """Rotation-only action on (..., 3) direction vectors."""
    return _mm(vecs, T[:3, :3].T)


def from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def normalize(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block via Newton polar iteration:
    R <- R (3I - R^T R) / 2, quadratically convergent for near-orthonormal R.

    Long chains of exp-updates drift in f32; the reference relies on Sophus'
    quaternion storage for this. SVD would be exact for arbitrary R but a
    3x3 SVD costs ~50 ms on a tunneled TPU dispatch; two Newton steps cost
    four tiny matmuls and handle the <=1e-3 drift this is guarding against.
    """
    R = T[:3, :3]
    I3 = jnp.eye(3, dtype=T.dtype)
    hi = jax.lax.Precision.HIGHEST  # TPU default matmul is bf16 — not here
    for _ in range(2):
        RtR = jnp.matmul(R.T, R, precision=hi)
        R = jnp.matmul(R, 3.0 * I3 - RtR, precision=hi) * 0.5
    return from_rt(R, T[:3, 3])


def normalize_svd(T: jax.Array) -> jax.Array:
    """Exact polar projection (SVD); for tests / far-from-orthonormal input."""
    R = T[:3, :3]
    u, _, vt = jnp.linalg.svd(R)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    Rn = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0], T.dtype)
                      + jnp.array([0.0, 0.0, 1.0], T.dtype) * d) @ vt
    return from_rt(Rn, T[:3, 3])
