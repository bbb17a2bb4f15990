"""Synthetic stereo sequences with exact ground truth.

The reference's tests depend on absolute paths to KITTI/EuRoC on the author's
machine (test/test_vo.cpp:114-122, 619-628) plus a bundled two-frame stereo
pair. For a hermetic harness we render sequences ourselves: a textured plane
observed by a moving pinhole camera is *exactly* renderable via homography
(H = K (R - t n^T / d) K^-1), including the rectified stereo pair — so VO
output can be scored against exact poses and exact depth with zero I/O.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from trackingbench_slam_tpu.utils.config import CameraConfig


def textured_plane(h: int, w: int, seed: int = 5, blobs: int = 600,
                   margin: float = 2.0) -> np.ndarray:
    """Big textured canvas (margin x view size) so warps never sample off the
    texture. Smoothed so bilinear warps behave like real images."""
    H, W = int(h * margin), int(w * margin)
    r = np.random.RandomState(seed)
    img = 80.0 + 50.0 * np.outer(np.linspace(0, 1, H), np.linspace(0, 1, W))
    for _ in range(blobs):
        y = r.randint(5, H - 20)
        x = r.randint(5, W - 20)
        bh = r.randint(3, 16)
        bw = r.randint(3, 16)
        img[y:y + bh, x:x + bw] = r.randint(10, 245)
    # light smoothing (box blur twice)
    k = np.ones(3) / 3.0
    img = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 0, img)
    img = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 1, img)
    return img.astype(np.float32)


@dataclasses.dataclass
class PlaneSequence:
    """Renders views of the plane z = depth (world frame) for camera poses
    T_cw (world->camera). The canvas is the plane's texture sampled at
    `scale` px per meter centered on the optical axis of the identity pose."""

    cam: CameraConfig
    depth: float = 8.0
    seed: int = 5

    def __post_init__(self):
        self.canvas = textured_plane(self.cam.height, self.cam.width,
                                     seed=self.seed)
        ch, cw = self.canvas.shape
        # plane coords: world (x, y, depth) maps to canvas pixel
        # (x * s + cw/2, y * s + ch/2) with s chosen so the identity view
        # fills the center of the canvas through the pinhole at `depth`.
        self.px_per_m = self.cam.fx / self.depth  # identity-view sampling
        self.c0 = np.array([cw / 2, ch / 2])

    def _canvas_of_world(self, xy_w: np.ndarray) -> np.ndarray:
        return xy_w * self.px_per_m + self.c0[None, :]

    def render(self, T_cw: np.ndarray) -> np.ndarray:
        """Render the view for world->camera pose T_cw by inverse warping:
        for each image pixel, intersect its ray with the plane z=depth and
        sample the canvas."""
        cfg = self.cam
        h, w = cfg.height, cfg.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        xn = (xs - cfg.cx) / cfg.fx
        yn = (ys - cfg.cy) / cfg.fy
        rays = np.stack([xn, yn, np.ones_like(xn)], axis=-1)  # camera frame
        T_wc = np.linalg.inv(T_cw)
        R = T_wc[:3, :3]
        c = T_wc[:3, 3]
        d_w = rays @ R.T  # world-frame ray directions
        # intersect with plane z = depth: c_z + t*d_z = depth
        t = (self.depth - c[2]) / d_w[..., 2]
        pts = c[None, None, :] + t[..., None] * d_w
        uv = self._canvas_of_world(pts[..., :2].reshape(-1, 2))
        out = _bilinear_np(self.canvas, uv).reshape(h, w)
        behind = (t <= 0.1).reshape(h, w)
        out[behind] = 0.0
        return out.astype(np.float32)

    def stereo_pair(self, T_cw: np.ndarray, baseline: float):
        """Left + right images for a rectified pair (right camera offset by
        +baseline along the camera x axis)."""
        left = self.render(T_cw)
        T_right = T_cw.copy()
        # right camera: x_right = x_left - baseline  => T_rw = T_shift @ T_cw
        shift = np.eye(4)
        shift[0, 3] = -baseline
        right = self.render(shift @ T_cw)
        return left, right

    def depth_map(self, T_cw: np.ndarray) -> np.ndarray:
        """Exact per-pixel depth (z in camera frame) for the view."""
        cfg = self.cam
        h, w = cfg.height, cfg.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        xn = (xs - cfg.cx) / cfg.fx
        yn = (ys - cfg.cy) / cfg.fy
        rays = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
        T_wc = np.linalg.inv(T_cw)
        R = T_wc[:3, :3]
        c = T_wc[:3, 3]
        d_w = rays @ R.T
        t = (self.depth - c[2]) / d_w[..., 2]
        # depth along camera z = t * (ray z in camera frame) = t * 1
        return t.astype(np.float32)


def _bilinear_np(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    h, w = img.shape
    x = np.clip(uv[:, 0], 0, w - 1.001)
    y = np.clip(uv[:, 1], 0, h - 1.001)
    x0 = x.astype(int)
    y0 = y.astype(int)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def lateral_trajectory(n: int, step: float = 0.04, yaw_amp: float = 0.01):
    """World->camera poses for a camera translating along +x with a gentle
    yaw oscillation — well-conditioned for a fronto-parallel plane scene."""
    from scipy.spatial.transform import Rotation
    poses = []
    for i in range(n):
        c = np.array([i * step, 0.015 * np.sin(i * 0.4), 0.01 * np.sin(i * 0.23)])
        yaw = yaw_amp * np.sin(i * 0.3)
        R_wc = Rotation.from_euler("y", yaw).as_matrix()
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = c
        poses.append(np.linalg.inv(T_wc))
    return np.stack(poses)
