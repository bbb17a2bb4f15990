"""Camera model tests: project/backproject roundtrips, distortion vs cv2."""

import numpy as np
import cv2
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import triangulation as tri
from trackingbench_slam_tpu.utils.config import CameraConfig


def _cam(dist=False):
    if dist:
        return CameraConfig(width=640, height=480, fx=450.0, fy=455.0,
                            cx=320.5, cy=239.5, k1=-0.28, k2=0.07,
                            p1=2e-4, p2=-2e-5, k3=0.0)
    return CameraConfig(width=640, height=480, fx=450.0, fy=455.0,
                        cx=320.5, cy=239.5)


def test_project_unproject_roundtrip_nodist(rng):
    cam = cam_mod.CameraParams.from_config(_cam(False))
    pts = rng.rand(50, 3).astype(np.float32)
    pts[:, :2] = (pts[:, :2] - 0.5) * 2
    pts[:, 2] = pts[:, 2] * 5 + 1
    px = cam_mod.world2cam(cam, jnp.asarray(pts))
    bearing = cam_mod.cam2world(cam, px)
    ref = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(bearing), ref, atol=1e-5)


def test_project_matches_cv2_with_distortion(rng):
    cfg = _cam(True)
    cam = cam_mod.CameraParams.from_config(cfg)
    pts = rng.rand(40, 3).astype(np.float64)
    pts[:, :2] = (pts[:, :2] - 0.5) * 1.0
    pts[:, 2] = pts[:, 2] * 4 + 2
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]])
    dist = np.array([cfg.k1, cfg.k2, cfg.p1, cfg.p2, cfg.k3])
    px_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, dist)
    px_cv = px_cv.reshape(-1, 2)
    px = cam_mod.world2cam(cam, jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(np.asarray(px), px_cv, atol=1e-2)


def test_undistort_points_matches_cv2(rng):
    cfg = _cam(True)
    cam = cam_mod.CameraParams.from_config(cfg)
    px = rng.rand(30, 2).astype(np.float64)
    px[:, 0] = px[:, 0] * 500 + 70
    px[:, 1] = px[:, 1] * 360 + 60
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]])
    dist = np.array([cfg.k1, cfg.k2, cfg.p1, cfg.p2, cfg.k3])
    und_cv = cv2.undistortPoints(px.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    und = cam_mod.undistort_points(cam, jnp.asarray(px, jnp.float32))
    np.testing.assert_allclose(np.asarray(und), und_cv, atol=0.05)


def test_projection_jacobian_matches_finite_difference(rng):
    import jax
    from trackingbench_slam_tpu.geometry import se3
    cam = cam_mod.CameraParams.from_config(_cam(False))
    pts = rng.rand(10, 3).astype(np.float32)
    pts[:, 2] += 2.0

    def proj_with_xi(xi, p):
        T = se3.exp(xi)
        return cam_mod.world2cam(cam, se3.transform_points(T, p[None]))[0]

    J = cam_mod.project_jacobian(cam, jnp.asarray(pts))
    for i in range(10):
        Jad = jax.jacobian(proj_with_xi)(jnp.zeros(6, jnp.float32),
                                         jnp.asarray(pts[i]))
        np.testing.assert_allclose(np.asarray(J[i]), np.asarray(Jad),
                                   rtol=1e-3, atol=1e-3)


def test_is_in_frame():
    cam = cam_mod.CameraParams.from_config(_cam(False))
    px = jnp.asarray([[10.0, 10.0], [-1.0, 50.0], [640.5, 100.0], [630.0, 470.0]])
    ok = cam_mod.is_in_frame(cam, px)
    assert list(np.asarray(ok)) == [True, False, False, True]


def test_triangulate_dlt(rng):
    cfg = _cam(False)
    cam = cam_mod.CameraParams.from_config(cfg)
    K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]],
                 np.float32)
    # camera 2 translated along x (stereo-ish)
    R = np.eye(3, dtype=np.float32)
    t = np.array([-0.5, 0.02, 0.01], np.float32)
    P1 = K @ np.hstack([np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)])
    P2 = K @ np.hstack([R, t[:, None]])
    pts = rng.rand(25, 3).astype(np.float32)
    pts[:, :2] = (pts[:, :2] - 0.5) * 2
    pts[:, 2] = pts[:, 2] * 5 + 3
    px1 = (pts @ P1[:, :3].T + P1[:, 3])
    px1 = px1[:, :2] / px1[:, 2:3]
    p2h = pts @ P2[:, :3].T + P2[:, 3]
    px2 = p2h[:, :2] / p2h[:, 2:3]
    X = tri.triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                            jnp.asarray(px1), jnp.asarray(px2))
    np.testing.assert_allclose(np.asarray(X), pts, atol=2e-2)


def test_triangulate_midpoint(rng):
    from trackingbench_slam_tpu.geometry import se3
    T_w1 = jnp.eye(4, dtype=jnp.float32)
    T_w2 = se3.exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32))
    pts = rng.rand(20, 3).astype(np.float32)
    pts[:, :2] = (pts[:, :2] - 0.5) * 2
    pts[:, 2] = pts[:, 2] * 5 + 3
    f1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    T2i = np.asarray(se3.inverse(T_w2))
    pc2 = pts @ T2i[:3, :3].T + T2i[:3, 3]
    f2 = pc2 / np.linalg.norm(pc2, axis=1, keepdims=True)
    X, valid = tri.triangulate_midpoint(T_w1, T_w2, jnp.asarray(f1), jnp.asarray(f2))
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(X), pts, atol=1e-3)


def test_stereo_depth():
    depth, valid = tri.stereo_depth(jnp.asarray(411.0),
                                    jnp.asarray([100.0, 200.0, 50.0]),
                                    jnp.asarray([90.0, 199.9, 55.0]))
    d = np.asarray(depth)
    v = np.asarray(valid)
    assert v[0] and not v[1] and not v[2]
    np.testing.assert_allclose(d[0], 41.1, rtol=1e-5)
