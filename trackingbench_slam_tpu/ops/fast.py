"""FAST segment-test corner detection as whole-image vectorized ops.

Replaces cv::FAST (reference src/extractors/ORBextractor.cpp:785-804) and the
absent fast_lib SSE2 kernels (fast_corner_detect_10 / fast_corner_score_10 /
fast_nonmax_3x3, called at src/extractors/FASTextractor.cpp:36-51).

TPU-first design: instead of per-pixel branchy segment tests, the whole image
is processed as 16 shifted views of itself (the radius-3 Bresenham circle).
"Is there an arc of N contiguous brighter/darker circle pixels" becomes a
log-depth chain of ANDs of circularly rolled boolean maps — pure VPU work
with zero data-dependent control flow. The score map and 3x3 NMS are likewise
shifted-view reductions. This file is the reference semantics; ops/pallas/
holds the fused-kernel version of the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Radius-3 Bresenham circle, same 16 offsets as fast_lib / OpenCV, starting at
# 12 o'clock going clockwise. (dy, dx) pairs.
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _circle_views(img: jax.Array) -> jax.Array:
    """(16, H, W) stack of the image shifted so that channel i holds circle
    pixel i relative to each center. Border ring (3 px) is garbage; callers
    mask it."""
    views = [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for (dy, dx) in CIRCLE_OFFSETS]
    return jnp.stack(views, axis=0)


def _partial(mask16: jax.Array, length: int) -> jax.Array:
    """AND over rolls 0..length-1 (length in [1, 16]), log-depth."""
    m = mask16
    covered = 1
    while covered * 2 <= length:
        m = m & jnp.roll(m, -covered, axis=0)
        covered *= 2
    rem = length - covered
    if rem > 0:
        m = m & jnp.roll(_partial(mask16, rem), -covered, axis=0)
    return m


def has_arc(mask16: jax.Array, arc: int) -> jax.Array:
    """(16, H, W) bool -> (H, W) bool: exists a circular run of >= arc."""
    return jnp.any(_partial(mask16, arc), axis=0)


@functools.partial(jax.jit, static_argnames=("threshold", "arc"))
def fast_score_map(img: jax.Array, threshold: float = 20.0, arc: int = 9) -> jax.Array:
    """FAST-N corner response for every pixel: (H, W) float32.

    Response definition (matches OpenCV/fast_lib ranking semantics): for
    pixels passing the segment test, the SAD-above-threshold score
    max(sum(max(0, (c - p) - t)), sum(max(0, (p - c) - t))) over the 16 circle
    pixels; 0 for non-corners. A 3-pixel border is zeroed.
    """
    img = img.astype(jnp.float32)
    c = _circle_views(img)  # (16, H, W)
    p = img[None]
    diff = c - p
    brighter = diff > threshold
    darker = diff < -threshold
    is_corner = has_arc(brighter, arc) | has_arc(darker, arc)
    sb = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    sd = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.maximum(sb, sd)
    score = jnp.where(is_corner, score, 0.0)
    # zero border ring where circle wraps
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, score, 0.0)


def _shift2d(x: jax.Array, dy: int, dx: int, fill: float) -> jax.Array:
    """Shift with constant fill (no wrap-around)."""
    h, w = x.shape
    out = jnp.full_like(x, fill)
    ys = slice(max(dy, 0), h + min(dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    ys_src = slice(max(-dy, 0), h + min(-dy, 0))
    xs_src = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[ys, xs].set(x[ys_src, xs_src])


@jax.jit
def nms3x3(score: jax.Array) -> jax.Array:
    """3x3 non-max suppression (reference fast_nonmax_3x3 semantics,
    FASTextractor.cpp:51). Ties broken toward raster order so exactly one of
    an equal pair survives: a pixel is suppressed by a strictly greater
    neighbor, or by an equal neighbor that precedes it in raster order."""
    suppressed = jnp.zeros_like(score, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = _shift2d(score, -dy, -dx, -jnp.inf)  # value at (y+dy, x+dx)
            earlier = (dy < 0) or (dy == 0 and dx < 0)
            if earlier:
                suppressed |= neigh >= score
            else:
                suppressed |= neigh > score
    return jnp.where((score > 0.0) & ~suppressed, score, 0.0)


@functools.partial(jax.jit, static_argnames=("half",))
def shi_tomasi_map(img: jax.Array, half: int = 4) -> jax.Array:
    """Shi-Tomasi (min eigenvalue of the gradient covariance) for every pixel
    over a (2*half)x(2*half) window.

    Batched version of FASTExtractor::shiTomasiScore (reference
    src/extractors/FASTextractor.cpp:87-127: 8x8 box of central-difference
    gradients, score = min eig of [[dXX, dXY], [dXY, dYY]] / (2*area)).
    """
    img = img.astype(jnp.float32)
    dx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    win = 2 * half
    area = win * win

    def box(x):
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, (win, win), (1, 1), "SAME")

    dxx = box(dx * dx)
    dyy = box(dy * dy)
    dxy = box(dx * dy)
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc) / area


def grid_topk(score: jax.Array, cell: int, per_cell: int, budget: int,
              min_score: float = 1e-6, strong: jax.Array | None = None):
    """Spatially-uniform keypoint selection with static shapes.

    Replaces the data-dependent quad-tree DistributeOctTree
    (reference src/extractors/ORBextractor.cpp:494-733) with the grid
    strategy the reference's own FASTextractor uses (FASTextractor.cpp:18-25):
    top `per_cell` responses per cell, then a global top-`budget` over cell
    winners. Returns (xy (budget, 2) float32, resp (budget,), valid (budget,)).
    Score map is expected to be already NMS'd.

    strong ((H, W) bool, optional) implements the reference's two-threshold
    fallback (ORBextractor.cpp:765-804: cv::FAST at iniThFAST per cell,
    retried at minThFAST only when empty): in a cell containing ANY strong
    corner, weak (non-strong) corners are ineligible; cells with no strong
    corner keep their weak ones.
    """
    h, w = score.shape
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    s = jnp.pad(score, ((0, ph), (0, pw)))
    H, W = h + ph, w + pw
    ncy, ncx = H // cell, W // cell

    def to_cells(x):
        return x.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3
                                                         ).reshape(
            ncy * ncx, cell * cell)

    if strong is not None:
        st = to_cells(jnp.pad(strong, ((0, ph), (0, pw))))
        cell_has_strong = jnp.any(st & (to_cells(s) > min_score), axis=1,
                                  keepdims=True)
        eligible = st | ~cell_has_strong
        s2 = jnp.where(eligible, to_cells(s), 0.0)
        cells = s2
    else:
        cells = to_cells(s)
    vals, idx = jax.lax.top_k(cells, per_cell)  # (ncells, per_cell)
    cy = jnp.arange(ncy * ncx) // ncx
    cx = jnp.arange(ncy * ncx) % ncx
    py = idx // cell + (cy * cell)[:, None]
    px = idx % cell + (cx * cell)[:, None]
    flat_vals = vals.reshape(-1)
    flat_x = px.reshape(-1).astype(jnp.float32)
    flat_y = py.reshape(-1).astype(jnp.float32)
    k = min(budget, flat_vals.shape[0])
    top_vals, top_idx = jax.lax.top_k(flat_vals, k)
    x = flat_x[top_idx]
    y = flat_y[top_idx]
    valid = top_vals > min_score
    if k < budget:
        pad = budget - k
        top_vals = jnp.pad(top_vals, (0, pad))
        x = jnp.pad(x, (0, pad))
        y = jnp.pad(y, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    xy = jnp.stack([x, y], axis=-1)
    xy = jnp.where(valid[:, None], xy, -1.0)
    return xy, top_vals, valid
