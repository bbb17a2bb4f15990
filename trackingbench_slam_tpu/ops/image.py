"""Image-space primitives: pyramid, separable Gaussian blur, bilinear sampling.

Replaces the reference's OpenCV usage:
  * pyramid chain      <- Frame::ComputePyramid (src/types/Frame.cpp:414-451,
                          cv::resize INTER_LINEAR at scale 0.8) and the ORB
                          pyramid of ORBextractor
  * 7x7 Gaussian blur  <- cv::GaussianBlur(7,7,sigma=2) before descriptor
                          sampling (src/extractors/ORBextractor.cpp:958-960)
  * bilinear sampling  <- hand-rolled interpolation in the aligners
                          (src/matchers/matcher.cpp:1070-1164, 1567-1592)

All images are float32 (H, W) in [0, 255]; XLA fuses the elementwise chains
and the blur is expressed as two 1-D convolutions that map onto the VPU.
Pyramids keep *static* per-level shapes derived from the config so everything
downstream compiles once.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def pyramid_shapes(h: int, w: int, num_levels: int, scale: float) -> list[tuple[int, int]]:
    """Static per-level shapes. Matches Frame::ComputePyramid's rounding
    (Frame.cpp:423: size * scale^level, cv::Size rounding)."""
    out = []
    for lvl in range(num_levels):
        s = scale ** lvl
        out.append((max(int(round(h * s)), 8), max(int(round(w * s)), 8)))
    return out


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize via jax.image (lowered to gathers/convs XLA handles well)."""
    return jax.image.resize(img, out_hw, method="linear", antialias=False)


def build_pyramid(img: jax.Array, num_levels: int, scale: float) -> list[jax.Array]:
    """Chain-resize like the reference (each level from the previous,
    Frame.cpp:421-448), preserving its low-pass behavior."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, num_levels, scale)
    levels = [img]
    for lvl in range(1, num_levels):
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return levels


def gaussian_kernel1d(ksize: int, sigma: float, dtype=jnp.float32) -> jax.Array:
    x = jnp.arange(ksize, dtype=dtype) - (ksize - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with reflect padding (matches cv::GaussianBlur's
    BORDER_REFLECT_101 default closely enough for descriptor stability)."""
    k = gaussian_kernel1d(ksize, sigma, img.dtype)
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def bilinear_sample(img: jax.Array, xy: jax.Array, *, pad_value: float = 0.0) -> jax.Array:
    """Sample (H, W) image at float coords (..., 2) = (x, y), bilinear.

    Out-of-bounds samples return pad_value. This is the batched equivalent of
    the reference's four-weight interpolation (matcher.cpp:1128-1140 etc.).
    """
    h, w = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xxc = jnp.clip(xx, 0, w - 1)
        yyc = jnp.clip(yy, 0, h - 1)
        v = img[yyc, xxc]
        return jnp.where(valid, v, pad_value)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def image_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradients (gx, gy), same stencil as the reference's
    0.5*(I[x+1]-I[x-1]) in the aligners (matcher.cpp:1188-1210)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    # zero the wrap-around borders
    gx = gx.at[:, 0].set(0).at[:, -1].set(0)
    gy = gy.at[0, :].set(0).at[-1, :].set(0)
    return gx, gy


def extract_patches(img: jax.Array, centers: jax.Array, half: int) -> jax.Array:
    """Gather (2*half+1)^2 patches around float centers with bilinear sampling.

    centers: (N, 2) float (x, y). Returns (N, P, P) with P = 2*half+1.
    Used by LK / Align2D / SparseImageAlign — the TPU version of the
    reference's per-patch pointer loops (matcher.cpp:1375-1463, 1554-1602).
    """
    P = 2 * half + 1
    offs = jnp.arange(P, dtype=img.dtype) - half
    ox, oy = jnp.meshgrid(offs, offs)  # (P, P)
    grid = jnp.stack([ox, oy], axis=-1)  # (P, P, 2)
    coords = centers[:, None, None, :] + grid[None]  # (N, P, P, 2)
    return bilinear_sample(img, coords)


def clahe_like(img: jax.Array, clip: float = 3.0, grid: int = 8) -> jax.Array:
    """Cheap global-contrast normalization (mean/std to mid-gray). Kept as the
    low-cost option next to the real `clahe` below; same purpose (stabilize LK
    under exposure changes) at a fraction of the gathers."""
    mean = jnp.mean(img)
    std = jnp.std(img) + 1e-6
    out = (img - mean) / std * 48.0 + 127.0
    return jnp.clip(out, 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("clip", "grid", "bins"))
def clahe(img: jax.Array, clip: float = 3.0, grid: int = 8,
          bins: int = 256) -> jax.Array:
    """Contrast-limited adaptive histogram equalization (Frame::Equalize,
    src/types/Frame.cpp:453-458: cv::createCLAHE(3.0, Size(8, 8))).

    TPU-native formulation: per-tile histograms via one segment_sum scatter
    (tile_id * bins + intensity), clip-and-redistribute, cumsum to per-tile
    LUTs, then one gather of the 4 neighboring tile LUTs per pixel with
    bilinear blending — no data-dependent shapes, no host loops.

    The image is processed at whatever size it has; tiles are grid x grid
    equal slabs (ceil-divided, like OpenCV). Input/output are float images in
    [0, 255]."""
    h, w = img.shape
    th = -(-h // grid)  # ceil
    tw = -(-w // grid)
    x = jnp.clip(img, 0.0, 255.0)
    q = jnp.clip((x * (bins / 256.0)).astype(jnp.int32), 0, bins - 1)
    ys = jnp.arange(h) // th  # tile row per pixel row
    xs = jnp.arange(w) // tw
    tile_id = ys[:, None] * grid + xs[None, :]  # (h, w)
    seg = (tile_id * bins + q).reshape(-1)
    hist = jax.ops.segment_sum(jnp.ones((h * w,), jnp.float32), seg,
                               num_segments=grid * grid * bins)
    hist = hist.reshape(grid * grid, bins)
    # contrast limiting: clip each bin at clip * (tile_pixels / bins) and
    # spread the excess uniformly (OpenCV semantics, one redistribution pass)
    npx = jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1.0)
    limit = jnp.maximum(clip * npx / bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / bins
    cdf = jnp.cumsum(hist, axis=1)
    # LUT: map intensity -> equalized value in [0, 255]. Plain cdf/npx
    # scaling, matching cv::CLAHE (an earlier revision subtracted the
    # zero-bin count, which deviated for tiles with many dark pixels)
    lut = cdf / npx * 255.0
    lut = jnp.clip(lut, 0.0, 255.0)  # (grid*grid, bins)

    # bilinear interpolation between the 4 surrounding tile centers
    cy = (jnp.arange(h, dtype=img.dtype) - (th - 1) / 2.0) / th
    cx = (jnp.arange(w, dtype=img.dtype) - (tw - 1) / 2.0) / tw
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, grid - 1)
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, grid - 1)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(cy - jnp.floor(cy), 0.0, 1.0)
    fx = jnp.clip(cx - jnp.floor(cx), 0.0, 1.0)
    # edge tiles extend outward (no blending past the outermost centers)
    fy = jnp.where((cy < 0) | (cy > grid - 1), jnp.round(jnp.clip(cy, 0, 1)), fy)
    fx = jnp.where((cx < 0) | (cx > grid - 1), jnp.round(jnp.clip(cx, 0, 1)), fx)

    def look(ty, tx):
        t = ty[:, None] * grid + tx[None, :]
        return lut[t, q]

    v00 = look(y0, x0)
    v01 = look(y0, x1)
    v10 = look(y1, x0)
    v11 = look(y1, x1)
    top = v00 * (1 - fx)[None, :] + v01 * fx[None, :]
    bot = v10 * (1 - fx)[None, :] + v11 * fx[None, :]
    return top * (1 - fy)[:, None] + bot * fy[:, None]
