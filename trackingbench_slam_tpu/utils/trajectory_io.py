"""Standard trajectory export/import: KITTI odometry and TUM-RGBD formats.

The reference only ever PRINTS estimated-vs-GT poses (test/test_vo.cpp:
763-764); there is no way to hand its output to evo/kitti-devkit-style
offline tooling. These writers produce the two interchange formats every
SLAM evaluation stack reads:

  KITTI:  one row per frame, 12 floats = row-major 3x4 of T_world_from_cam
          (the same convention as the dataset's poses/SS.txt files).
  TUM:    "timestamp tx ty tz qx qy qz qw" per row, pose = cam->world.

All functions take/return world->camera (T_cw) 4x4 arrays — the pipeline's
native convention (StereoVO.poses()) — and convert at the boundary.
"""

from __future__ import annotations

import numpy as np


def _as_Twc(T_cw: np.ndarray) -> np.ndarray:
    T_cw = np.asarray(T_cw, np.float64)
    return np.linalg.inv(T_cw)


def save_kitti_trajectory(path: str, T_cw: np.ndarray) -> None:
    """Write (N, 4, 4) world->camera poses as KITTI 3x4 rows."""
    T_wc = _as_Twc(T_cw)
    np.savetxt(path, T_wc[:, :3, :].reshape(len(T_wc), 12), fmt="%.9e")


def load_kitti_trajectory(path: str) -> np.ndarray:
    """Read KITTI 3x4 rows -> (N, 4, 4) world->camera poses."""
    raw = np.loadtxt(path)
    raw = raw.reshape(-1, 3, 4)
    T_wc = np.tile(np.eye(4), (raw.shape[0], 1, 1))
    T_wc[:, :3, :] = raw
    return np.linalg.inv(T_wc)


def save_tum_trajectory(path: str, T_cw: np.ndarray,
                        timestamps: np.ndarray | None = None) -> None:
    """Write TUM-RGBD format: t tx ty tz qx qy qz qw (cam->world)."""
    from scipy.spatial.transform import Rotation
    T_wc = _as_Twc(T_cw)
    n = len(T_wc)
    ts = np.arange(n, dtype=np.float64) if timestamps is None else (
        np.asarray(timestamps, np.float64))
    q = Rotation.from_matrix(T_wc[:, :3, :3]).as_quat()  # x y z w
    rows = np.column_stack([ts, T_wc[:, :3, 3], q])
    np.savetxt(path, rows, fmt="%.9f")


def load_tum_trajectory(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read TUM rows -> (timestamps (N,), T_cw (N, 4, 4))."""
    from scipy.spatial.transform import Rotation
    raw = np.loadtxt(path)
    raw = np.atleast_2d(raw)
    ts = raw[:, 0]
    T_wc = np.tile(np.eye(4), (raw.shape[0], 1, 1))
    T_wc[:, :3, :3] = Rotation.from_quat(raw[:, 4:8]).as_matrix()
    T_wc[:, :3, 3] = raw[:, 1:4]
    return ts, np.linalg.inv(T_wc)
