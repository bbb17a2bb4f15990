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
    a_new = (e - f) / jnp.maximum(f - e / jnp.maximum(f, 1e-12), 1e-12)
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


def seed_status(seeds: SeedState, sigma_thresh: float = 1.0 / 200.0):
    """(converged, diverged) masks (SVO: sigma < z_range/200 converges;
    inlier ratio < 0.1 diverges)."""
    inlier_ratio = seeds.a / jnp.maximum(seeds.a + seeds.b, 1e-9)
    converged = seeds.valid & (jnp.sqrt(seeds.sigma2)
                               < sigma_thresh * seeds.z_range)
    diverged = seeds.valid & (inlier_ratio < 0.1)
    return converged, diverged


def seed_depths(seeds: SeedState) -> jax.Array:
    return 1.0 / jnp.maximum(seeds.mu, 1e-9)
