"""Recursive Bayesian depth filter (SVO-style) — batched over seeds.

The reference ships only an empty stub for this component
(src/mapping/DepthFilter.cpp:1-5, include/mapping/DepthFilter.h:6-12 — the
planned SVO depth filter was never implemented). This is the real thing,
TPU-native: the Vogiatzis-Hernandez Gaussian x Uniform mixture posterior over
inverse depth, updated in closed form per observation, fully vectorized over
a fixed-capacity seed table.

Each seed tracks (mu, sigma2, a, b, z_range) on INVERSE depth:
  * mu, sigma2 — Gaussian belief
  * a, b       — Beta pseudo-counts of inlier/outlier observations
  * converged when sigma < sigma_thresh * z_range; diverged when the inlier
    ratio E[Beta] drops below 0.1

Observations arrive as triangulated depths (from two-view geometry of the
tracked feature) plus a geometric 1-pixel-disparity uncertainty tau
(compute_tau), exactly the SVO formulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SeedState(NamedTuple):
    mu: jax.Array       # (S,) inverse-depth mean
    sigma2: jax.Array   # (S,) inverse-depth variance
    a: jax.Array        # (S,) inlier pseudo-count
    b: jax.Array        # (S,) outlier pseudo-count
    z_range: jax.Array  # (S,) inverse-depth search range (1/z_min)
    valid: jax.Array    # (S,)

    @classmethod
    def init(cls, depth_mean: jax.Array, depth_min: jax.Array,
             valid: jax.Array) -> "SeedState":
        """Seed from a coarse depth guess (SVO: scene mean depth)."""
        z = 1.0 / jnp.maximum(depth_mean, 1e-6)
        zr = 1.0 / jnp.maximum(depth_min, 1e-6)
        return cls(mu=z, sigma2=(zr / 6.0) ** 2,
                   a=jnp.full_like(z, 10.0), b=jnp.full_like(z, 10.0),
                   z_range=zr, valid=valid)


def compute_tau(T_ref_cur_t: jax.Array, f: jax.Array, z: jax.Array,
                px_error_angle: jax.Array) -> jax.Array:
    """Depth standard deviation corresponding to one pixel of disparity
    (SVO depth_filter computeTau): triangle spanned by the bearing f, the
    baseline t, and a ray perturbed by the pixel error angle."""
    t = T_ref_cur_t
    a = f * z[..., None] - t[None, :]
    t_norm = jnp.linalg.norm(t)
    a_norm = jnp.linalg.norm(a, axis=-1)
    alpha = jnp.arccos(jnp.clip(jnp.sum(f * t[None, :], axis=-1)
                                / jnp.maximum(t_norm, 1e-9), -1, 1))
    beta = jnp.arccos(jnp.clip(jnp.sum(a * -t[None, :], axis=-1)
                               / jnp.maximum(a_norm * t_norm, 1e-9), -1, 1))
    beta_plus = beta + px_error_angle
    gamma_plus = jnp.pi - alpha - beta_plus
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.maximum(jnp.sin(gamma_plus),
                                                       1e-9)
    return jnp.abs(z_plus - z)


@jax.jit
def update_seeds(seeds: SeedState, z_obs: jax.Array, tau2: jax.Array,
                 obs_valid: jax.Array) -> SeedState:
    """One Bayesian update per seed (SVO updateSeed / Vogiatzis eq. 10-12).

    z_obs: (S,) observed INVERSE depth; tau2: (S,) its variance (inverse-
    depth domain); obs_valid: (S,) which seeds got an observation.
    """
    norm_scale = jnp.sqrt(seeds.sigma2 + tau2)
    s2 = 1.0 / (1.0 / jnp.maximum(seeds.sigma2, 1e-12)
                + 1.0 / jnp.maximum(tau2, 1e-12))
    m = s2 * (seeds.mu / jnp.maximum(seeds.sigma2, 1e-12)
              + z_obs / jnp.maximum(tau2, 1e-12))
    # inlier likelihood under current belief vs uniform outlier model
    gauss = jnp.exp(-0.5 * ((z_obs - seeds.mu) / jnp.maximum(norm_scale, 1e-9)) ** 2) \
        / jnp.maximum(norm_scale * jnp.sqrt(2 * jnp.pi), 1e-12)
    C1 = seeds.a / (seeds.a + seeds.b) * gauss
    C2 = seeds.b / (seeds.a + seeds.b) / jnp.maximum(seeds.z_range, 1e-9)
    norm = jnp.maximum(C1 + C2, 1e-12)
    C1 = C1 / norm
    C2 = C2 / norm
    f = C1 * (seeds.a + 1.0) / (seeds.a + seeds.b + 1.0) \
        + C2 * seeds.a / (seeds.a + seeds.b + 1.0)
    e = C1 * (seeds.a + 1.0) * (seeds.a + 2.0) \
        / ((seeds.a + seeds.b + 1.0) * (seeds.a + seeds.b + 2.0)) \
        + C2 * seeds.a * (seeds.a + 1.0) \
        / ((seeds.a + seeds.b + 1.0) * (seeds.a + seeds.b + 2.0))
    mu_new = C1 * m + C2 * seeds.mu
    sigma2_new = C1 * (s2 + m * m) + C2 * (seeds.sigma2 + seeds.mu ** 2) \
        - mu_new ** 2
    # Beta moment matching (Vogiatzis eq. 12 / SVO updateSeed):
    # a = (e - f) / (f - e/f). Both numerator and denominator are negative
    # for a proper Beta (variance > 0), so the zero-guard must preserve the
    # SIGN — clamping the denominator to +eps flips a to a huge negative
    # value and the clip floor freezes the inlier ratio at 0.5.
    denom = f - e / jnp.maximum(f, 1e-12)
    denom = jnp.where(jnp.abs(denom) < 1e-12,
                      jnp.where(denom < 0, -1e-12, 1e-12), denom)
    a_new = (e - f) / denom
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-12)
    upd = obs_valid & seeds.valid
    return SeedState(
        mu=jnp.where(upd, mu_new, seeds.mu),
        sigma2=jnp.where(upd, jnp.maximum(sigma2_new, 1e-12), seeds.sigma2),
        a=jnp.where(upd, jnp.clip(a_new, 1e-3, 1e4), seeds.a),
        b=jnp.where(upd, jnp.clip(b_new, 1e-3, 1e4), seeds.b),
        z_range=seeds.z_range,
        valid=seeds.valid,
    )


def seed_status(seeds: SeedState, sigma_thresh: float = 1.0 / 200.0,
                min_inlier_ratio: float = 0.5):
    """(converged, diverged) masks (SVO: sigma < z_range/200 converges;
    inlier ratio < 0.1 diverges). Convergence additionally requires a
    healthy Beta inlier ratio: outlier streams can shrink sigma around a
    junk mode while a/b keeps falling — such seeds must not promote."""
    inlier_ratio = seeds.a / jnp.maximum(seeds.a + seeds.b, 1e-9)
    converged = (seeds.valid
                 & (jnp.sqrt(seeds.sigma2) < sigma_thresh * seeds.z_range)
                 & (inlier_ratio > min_inlier_ratio))
    diverged = seeds.valid & (inlier_ratio < 0.1)
    return converged, diverged


def seed_depths(seeds: SeedState) -> jax.Array:
    return 1.0 / jnp.maximum(seeds.mu, 1e-9)


def depth_from_triangulation(T_cur_ref: jax.Array, f_ref: jax.Array,
                             f_cur: jax.Array):
    """Two-view depth along the REF bearing (SVO depthFromTriangulation):
    solve the 2x2 least-squares  [R f_ref | -f_cur] [z_ref; z_cur] = -t
    for each seed. f_ref/f_cur: (S, 3) unit bearings; T_cur_ref: (4, 4).

    Returns (z_ref (S,), ok (S,)) — ok rejects near-parallel rays (singular
    normal equations)."""
    R = T_cur_ref[:3, :3]
    t = T_cur_ref[:3, 3]
    a = f_ref @ R.T              # (S, 3) = R f_ref
    b = -f_cur
    # normal equations of [a | b] x = -t
    A11 = jnp.sum(a * a, axis=-1)
    A12 = jnp.sum(a * b, axis=-1)
    A22 = jnp.sum(b * b, axis=-1)
    r1 = -jnp.sum(a * t[None, :], axis=-1)
    r2 = -jnp.sum(b * t[None, :], axis=-1)
    det = A11 * A22 - A12 * A12
    ok = jnp.abs(det) > 1e-8
    det_s = jnp.where(ok, det, 1.0)
    z_ref = (A22 * r1 - A12 * r2) / det_s
    z_cur = (A11 * r2 - A12 * r1) / det_s
    ok = ok & (z_ref > 1e-3) & (z_cur > 1e-3)
    return z_ref, ok


def tau_inverse(z: jax.Array, tau: jax.Array) -> jax.Array:
    """Map a depth-domain std tau to the inverse-depth domain (SVO:
    0.5 * (1/max(eps, z - tau) - 1/(z + tau)))."""
    lo = jnp.maximum(z - tau, 1e-4)
    return 0.5 * (1.0 / lo - 1.0 / (z + tau))
