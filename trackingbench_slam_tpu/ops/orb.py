"""Oriented BRIEF (ORB) descriptors, batched over keypoints.

Replaces the reference's per-keypoint descriptor loop
(src/extractors/ORBextractor.cpp:48-87 computeOrbDescriptor and the
intensity-centroid orientation IC_Angle at ORBextractor.cpp:17-44).

Design notes (TPU-first):
  * Orientation: every keypoint gathers its 31x31 patch once; the circular
    mask and coordinate moments are a single masked tensor contraction over
    the whole keypoint batch.
  * Descriptor: the 256 point-pair test runs as one gather of (N, 256, 2)
    rotated sample positions + a compare + bit-pack — no per-keypoint loop.
  * Pattern: the reference carries ORB-SLAM2's learned 256-pair table
    (ORBextractor.cpp:90-348). We instead generate a deterministic BRIEF-style
    Gaussian pattern (the construction from the original ORB/BRIEF papers,
    sigma = patch/5, fixed seed). Descriptors are therefore not bit-compatible
    with OpenCV's ORB — which does not matter here because matching, BoW
    vocabulary, and maps are all built inside this framework — while the
    statistical behavior (256-bit binary tests on a smoothed rotated patch)
    is the same.
  * Bits are packed into (N, 8) uint32 words; Hamming matching unpacks them
    to ±1 int8 for MXU matmuls (see ops/hamming.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

PATCH_HALF = 15  # reference HALF_PATCH_SIZE (ORBextractor.cpp:14)
PATCH_SIZE = 2 * PATCH_HALF + 1
NUM_BITS = 256
_PATTERN_SEED = 20260817


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 2, 2) int32: for each bit, two (x, y) offsets in [-13, 13].

    Prefers the LEARNED pattern (ops/orb_pattern_learned.py, produced by
    tools/train_orb_pattern.py with the ORB paper's greedy decorrelation
    search over this repo's own synthetic patch corpus — the same training
    procedure behind the reference's bit_pattern_31_,
    ORBextractor.cpp:90-348, with none of its data). Falls back to
    deterministic Gaussian sampling (BRIEF-II construction) if the learned
    table is absent.
    """
    try:
        from trackingbench_slam_tpu.ops.orb_pattern_learned import (
            LEARNED_PAIRS)
        return np.asarray(LEARNED_PAIRS, np.int32)
    except ImportError:
        pass
    rng = np.random.RandomState(_PATTERN_SEED)
    sigma = PATCH_SIZE / 5.0
    pts = []
    while len(pts) < NUM_BITS:
        p = np.clip(np.round(rng.randn(2, 2) * sigma), -13, 13).astype(np.int32)
        if np.all(p[0] == p[1]):
            continue
        pts.append(p)
    return np.stack(pts, axis=0)  # (256, 2, 2) as (bit, which_point, xy)


@functools.lru_cache(maxsize=1)
def pattern_id() -> str:
    """Stable content hash of the active BRIEF pattern table.

    Descriptors are only comparable when extracted with the SAME pattern —
    any artifact that persists descriptors (map checkpoints, trained BoW
    vocabularies) records this id so a later load against a different
    pattern (e.g. the Gaussian fallback vs the learned table) fails loudly
    instead of producing meaningless Hamming distances."""
    import hashlib
    return hashlib.sha256(brief_pattern().tobytes()).hexdigest()[:16]


def _circle_umax_mask() -> np.ndarray:
    """(31, 31) float mask of the radius-15 circular patch, built row-wise the
    same way the reference builds u_max (ORBextractor.cpp:930-945 semantics)."""
    ys, xs = np.mgrid[-PATCH_HALF:PATCH_HALF + 1, -PATCH_HALF:PATCH_HALF + 1]
    return (xs * xs + ys * ys <= PATCH_HALF * PATCH_HALF).astype(np.float32)


@jax.jit
def ic_angle(img: jax.Array, xy: jax.Array, valid: jax.Array) -> jax.Array:
    """Intensity-centroid orientation per keypoint.

    img: (H, W) float; xy: (N, 2) float pixel coords; valid: (N,) bool.
    Returns (N,) angle in radians. Matches IC_Angle (ORBextractor.cpp:17-44):
    m10 = sum(x * I), m01 = sum(y * I) over the circular 31x31 patch,
    angle = atan2(m01, m10).
    """
    h, w = img.shape
    mask = jnp.asarray(_circle_umax_mask())
    offs = jnp.arange(PATCH_SIZE, dtype=jnp.int32) - PATCH_HALF
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    px = cx[:, None, None] + ox[None]
    py = cy[:, None, None] + oy[None]
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    patches = img[pyc, pxc] * jnp.where(inb, 1.0, 0.0) * mask[None]
    m10 = jnp.sum(patches * ox[None].astype(img.dtype), axis=(1, 2))
    m01 = jnp.sum(patches * oy[None].astype(img.dtype), axis=(1, 2))
    ang = jnp.arctan2(m01, m10)
    return jnp.where(valid, ang, 0.0)


@jax.jit
def brief_descriptors(img_blur: jax.Array, xy: jax.Array, angle: jax.Array,
                      valid: jax.Array) -> jax.Array:
    """Rotated-BRIEF descriptors.

    img_blur: (H, W) float, pre-blurred (7x7 sigma 2, reference
    ORBextractor.cpp:958-960). xy: (N, 2) float; angle: (N,) radians.
    Returns (N, 8) uint32 (256 bits). Invalid keypoints get all-zero words.

    Reference semantics (computeOrbDescriptor, ORBextractor.cpp:48-87): each
    pattern point is rotated by the keypoint angle with *rounded* integer
    lookup; bit i = 1 iff I(p_a) < I(p_b).
    """
    h, w = img_blur.shape
    pat = jnp.asarray(brief_pattern(), dtype=jnp.float32)  # (256, 2, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    # rotate: x' = x cos - y sin ; y' = x sin + y cos
    px = pat[None, :, :, 0]  # (1, 256, 2)
    py = pat[None, :, :, 1]
    rx = px * ca[:, None, None] - py * sa[:, None, None]
    ry = px * sa[:, None, None] + py * ca[:, None, None]
    sx = jnp.round(xy[:, 0, None, None] + rx).astype(jnp.int32)
    sy = jnp.round(xy[:, 1, None, None] + ry).astype(jnp.int32)
    sxc = jnp.clip(sx, 0, w - 1)
    syc = jnp.clip(sy, 0, h - 1)
    vals = img_blur[syc, sxc]  # (N, 256, 2)
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint32)  # (N, 256)
    bits = jnp.where(valid[:, None], bits, 0)
    words = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return packed


def unpack_to_pm1(desc: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) int8 in {-1, +1}.

    Feeds the MXU Hamming matcher: for 256-bit strings a, b with ±1 encodings
    A, B: hamming(a, b) = (256 - A·B) / 2.
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256)
    return (bits.astype(jnp.int8) * 2 - 1)


def unpack_bits(desc: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) uint8 bits {0, 1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.uint8)


def pack_bits(bits: jax.Array) -> jax.Array:
    """(N, 256) {0,1} -> (N, 8) uint32."""
    words = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
