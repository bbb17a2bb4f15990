"""Hamming-distance matching primitives.

Replaces the reference's popcount loop DescriptorDistance
(src/matchers/matcher.cpp:793-808), cv::BFMatcher / FLANN-LSH usage
(matcher.cpp:17-20), and the rotation-consistency histogram
ComputeThreeMaxima (matcher.cpp:810-851).

Two distance paths:
  * `hamming_matrix_popcount`: XOR + lax.population_count over (N1, N2, 8)
    uint32 words — exact, VPU-bound. Best for small sets.
  * `hamming_matrix_mxu`: descriptors unpacked to ±1 int8 and contracted on
    the MXU: d = (256 - A·Bᵀ) / 2. For the 2000-feature operating point this
    is a (2048, 256) x (256, 2048) int8 matmul — exactly the shape the
    systolic array wants, and the reason brute-force beats LSH approximations
    on TPU (the reference's FLANN-LSH exists only to dodge CPU brute-force
    cost; here the exact matrix is cheaper, so `searchByNN` and `searchByBF`
    share this kernel with different post-filters).

All matchers work on *static-capacity* keypoint sets with validity masks.
Invalid rows/columns get distance INF_DIST and never match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF_DIST = 10_000.0


def hamming_matrix_popcount(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(N1, 8) x (N2, 8) uint32 -> (N1, N2) int32 Hamming distances."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix_mxu(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """(N1, 256) x (N2, 256) ±1 int8 -> (N1, N2) int32 Hamming distances.

    d = (256 - <a, b>) / 2. The int8 contraction runs on the MXU with int32
    accumulation.
    """
    dot = jax.lax.dot_general(
        b1, b2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (256 - dot) // 2


def masked_distance(dist: jax.Array, valid1: jax.Array, valid2: jax.Array,
                    extra_mask: jax.Array | None = None) -> jax.Array:
    """Apply validity (and optional (N1, N2) candidate) masks."""
    m = valid1[:, None] & valid2[None, :]
    if extra_mask is not None:
        m = m & extra_mask
    return jnp.where(m, dist.astype(jnp.float32), INF_DIST)


def best_two(dist: jax.Array):
    """Per row: (best_idx, best_dist, second_dist). dist: (N1, N2) float."""
    best_idx = jnp.argmin(dist, axis=1)
    n1 = dist.shape[0]
    rows = jnp.arange(n1)
    best = dist[rows, best_idx]
    masked = dist.at[rows, best_idx].set(INF_DIST)
    second = jnp.min(masked, axis=1)
    return best_idx, best, second


def mutual_best(dist: jax.Array):
    """Cross-check (cv::BFMatcher crossCheck=true, matcher.cpp:20): row best
    must also be column best. Returns (idx (N1,), dist (N1,), mutual (N1,) bool)."""
    best12 = jnp.argmin(dist, axis=1)
    best21 = jnp.argmin(dist, axis=0)
    rows = jnp.arange(dist.shape[0])
    mutual = best21[best12] == rows
    return best12, dist[rows, best12], mutual


def ratio_filter(best: jax.Array, second: jax.Array, ratio: float) -> jax.Array:
    """Lowe-style test as used at matcher.cpp:352-356 / 79-85."""
    return best < ratio * second


def rotation_histogram_mask(angles1: jax.Array, angles2: jax.Array,
                            match_idx: jax.Array, match_ok: jax.Array,
                            histo_length: int = 30, top_bins: int = 3) -> jax.Array:
    """Rotation-consistency filter (ComputeThreeMaxima, matcher.cpp:810-851).

    Each accepted match votes its angle difference into `histo_length` bins;
    only matches in the top-`top_bins` bins survive — with the reference's
    relative-count gate (a bin below 0.1x the max bin is dropped even inside
    the top 3, matcher.cpp:840-848).

    angles are radians; the reference works in degrees with factor 1/(360/30).
    Returns a (N1,) bool mask.
    """
    two_pi = 2.0 * jnp.pi
    diff = angles1 - angles2[match_idx]
    diff = jnp.mod(diff, two_pi)
    bins = jnp.clip((diff * histo_length / two_pi).astype(jnp.int32), 0, histo_length - 1)
    votes = jnp.where(match_ok, 1, 0)
    hist = jax.ops.segment_sum(votes, bins, num_segments=histo_length)
    top_vals, top_idx = jax.lax.top_k(hist, top_bins)
    max1 = top_vals[0]
    keep_bin = jnp.zeros((histo_length,), dtype=bool)
    for i in range(top_bins):
        # a bin survives only with actual votes (empty top-k slots — e.g. all
        # matches in one bin — must not whitelist bin index 0 by accident)
        has_votes = top_vals[i] > 0
        ok = top_vals[i].astype(jnp.float32) > 0.1 * max1.astype(jnp.float32)
        keep_bin = keep_bin.at[top_idx[i]].set(has_votes & (ok | (i == 0)))
    return match_ok & keep_bin[bins]


def resolve_duplicate_targets(match_idx: jax.Array, match_dist: jax.Array,
                              match_ok: jax.Array, n_targets: int):
    """Keep only the lowest-distance source per target (one-to-one matching).

    The reference enforces this implicitly by iteration-order bookkeeping in
    several strategies (e.g. matcher.cpp:569-575 skips targets that already
    have a MapPoint); a scatter-min does it in one shot.
    Returns updated match_ok.
    """
    big = INF_DIST
    d = jnp.where(match_ok, match_dist, big)
    tgt = jnp.where(match_ok, match_idx, n_targets)  # park invalid in slot n
    best_per_tgt = jnp.full((n_targets + 1,), big).at[tgt].min(d)
    is_best = d <= best_per_tgt[tgt]
    # break exact ties by keeping the lowest source index
    src = jnp.arange(match_idx.shape[0])
    tie_key = jnp.where(is_best & match_ok, src, src.shape[0])
    first_best = jnp.full((n_targets + 1,), src.shape[0]).at[tgt].min(tie_key)
    return match_ok & is_best & (first_best[tgt] == src)
