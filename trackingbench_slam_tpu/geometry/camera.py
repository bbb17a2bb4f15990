"""Pinhole camera model with radial-tangential distortion — pure, batched.

Replaces the reference's PinholeCamera class (src/camera/CameraModel.cpp):
  * cam2world  <-  CameraModel.cpp:30-56   (pixel -> unit bearing; iterative
                                            undistortion when distorted)
  * world2cam  <-  CameraModel.cpp:63-94   (3D point -> pixel, distortion
                                            polynomial identical in intent)
  * undistort_points <- CameraModel.cpp:104-121
  * is_in_frame <- CameraModel.h:33-39
  * undistort remap tables <- CameraModel.cpp:14-27 (precomputed gather map)

Everything is expressed over (..., 2)/(..., 3) arrays so the whole keypoint set
is projected in one fused XLA op; no per-point objects.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.utils.config import CameraConfig


class CameraParams(NamedTuple):
    """Device-resident camera parameters (a pytree leaf bundle)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array  # (5,) = k1, k2, p1, p2, k3
    size: jax.Array  # (2,) = (width, height) float
    bf: jax.Array

    @classmethod
    def from_config(cls, c: CameraConfig, dtype=jnp.float32) -> "CameraParams":
        return cls(
            fx=jnp.asarray(c.fx, dtype),
            fy=jnp.asarray(c.fy, dtype),
            cx=jnp.asarray(c.cx, dtype),
            cy=jnp.asarray(c.cy, dtype),
            dist=jnp.asarray([c.k1, c.k2, c.p1, c.p2, c.k3], dtype),
            size=jnp.asarray([c.width, c.height], dtype),
            bf=jnp.asarray(c.bf, dtype),
        )


def distort_normalized(cam: CameraParams, xy: jax.Array) -> jax.Array:
    """Apply the radtan polynomial to normalized coords (..., 2).

    Same model as CameraModel.cpp:78-92: r2 = x^2+y^2,
    radial = 1 + k1 r2 + k2 r2^2 + k3 r2^3, tangential p1/p2 terms.
    """
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: CameraParams, xy_d: jax.Array, iters: int = 8) -> jax.Array:
    """Invert the distortion polynomial by fixed-point iteration.

    The reference uses cv::undistortPoints (CameraModel.cpp:104-121) which runs
    the same fixed-count iteration internally; a static iteration count keeps
    this jit-friendly.
    """

    xy = xy_d
    for _ in range(iters):
        # x_{n+1} = x_d - distortion_residual(x_n)
        delta = distort_normalized(cam, xy) - xy
        xy = xy_d - delta
    return xy


def world2cam(cam: CameraParams, pts_cam: jax.Array) -> jax.Array:
    """(..., 3) camera-frame points -> (..., 2) pixels (with distortion).

    Reference: CameraModel.cpp:63-94. Division is guarded: points with z <= 0
    still produce finite pixels (callers mask on depth separately, mirroring
    the behind-camera rejection at matcher.cpp:551-556).
    """
    z = pts_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xy = pts_cam[..., :2] / zsafe[..., None]
    xy = distort_normalized(cam, xy)
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def cam2world(cam: CameraParams, px: jax.Array) -> jax.Array:
    """(..., 2) pixels -> (..., 3) unit bearing vectors.

    Reference: CameraModel.cpp:30-56 (normalize, undistort, unit-norm).
    """
    x = (px[..., 0] - cam.cx) / cam.fx
    y = (px[..., 1] - cam.cy) / cam.fy
    xy = jnp.stack([x, y], axis=-1)
    xy = undistort_normalized(cam, xy)
    v = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def undistort_points(cam: CameraParams, px: jax.Array) -> jax.Array:
    """Distorted pixel -> undistorted pixel (reference CameraModel.cpp:104-121)."""
    x = (px[..., 0] - cam.cx) / cam.fx
    y = (px[..., 1] - cam.cy) / cam.fy
    xy = undistort_normalized(cam, jnp.stack([x, y], axis=-1))
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def is_in_frame(cam: CameraParams, px: jax.Array, boundary: float = 0.0,
                level: jax.Array | int = 0, scale_factor: float = 0.5) -> jax.Array:
    """(..., 2) -> (...,) bool. Reference: CameraModel.h:33-39 applies the
    boundary at a pyramid level (boundary scaled by 2^-level in the reference;
    here by scale_factor**level to match our pyramid)."""
    s = jnp.asarray(scale_factor) ** jnp.asarray(level)
    w = cam.size[0] * s
    h = cam.size[1] * s
    u, v = px[..., 0], px[..., 1]
    return (u >= boundary) & (v >= boundary) & (u < w - boundary) & (v < h - boundary)


def undistort_map(cam: CameraParams, height: int, width: int) -> jax.Array:
    """Precompute the gather map for image undistortion.

    Reference precomputes cv::initUndistortRectifyMap once in the constructor
    (CameraModel.cpp:14-27) and remaps per frame (CameraModel.cpp:96-102). The
    TPU analogue: for each *output* (undistorted) pixel, the distorted source
    coordinate to sample bilinearly. Returns (H, W, 2) float (x_src, y_src).
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    u, v = jnp.meshgrid(xs, ys)
    xn = (u - cam.cx) / cam.fx
    yn = (v - cam.cy) / cam.fy
    xy = distort_normalized(cam, jnp.stack([xn, yn], axis=-1))
    xs_src = cam.fx * xy[..., 0] + cam.cx
    ys_src = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([xs_src, ys_src], axis=-1)


def undistort_image(cam: CameraParams, img: jax.Array) -> jax.Array:
    """Apply the precomputed undistortion map to an image
    (PinholeCamera::UndistortImage, CameraModel.cpp:96-102: cv::remap with
    the constructor-precomputed tables). One bilinear gather pass."""
    from trackingbench_slam_tpu.ops.image import bilinear_sample
    h, w = img.shape
    m = undistort_map(cam, h, w)
    return bilinear_sample(img, m)


def project_jacobian(cam: CameraParams, pts_cam: jax.Array) -> jax.Array:
    """d(pixel)/d(xi) for a camera-frame point: (..., 3) -> (..., 2, 6).

    The analytic 2x6 Jacobian of the projected pixel w.r.t. a left-multiplied
    se(3) increment on T_cam_world, tangent ordered [rho, phi]. This is the
    batched equivalent of the reference's Frame::JacobianXYZ2uv
    (include/types/Frame.h:132-156), multiplied by focal lengths (the
    reference leaves focal out and multiplies later at matcher.cpp:1233-1236;
    we keep it in for a single fused op).

    Sign convention: residual = observed - projected; callers negate as
    needed. Distortion is treated as locally identity (standard SLAM practice
    on undistorted keypoints, and exactly what the reference's g2o edge does —
    fixed fx/fy, no distortion, LocalBA.cpp:356-359 semantics without the
    hardcoded-intrinsics bug).
    """
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    zi = 1.0 / zs
    zi2 = zi * zi
    fx, fy = cam.fx, cam.fy
    # du/d[rho, phi]
    du = jnp.stack([
        fx * zi,
        jnp.zeros_like(x),
        -fx * x * zi2,
        -fx * x * y * zi2,
        fx * (1.0 + x * x * zi2),
        -fx * y * zi,
    ], axis=-1)
    dv = jnp.stack([
        jnp.zeros_like(x),
        fy * zi,
        -fy * y * zi2,
        -fy * (1.0 + y * y * zi2),
        fy * x * y * zi2,
        fy * x * zi,
    ], axis=-1)
    return jnp.stack([du, dv], axis=-2)
