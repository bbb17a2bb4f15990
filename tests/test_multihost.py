"""Multi-host entry path: initialize() fallback, host-aware mesh layout,
and the sharded grouped BA solve matching the single-device solve on the
host mesh (the dryrun's correctness gate, testable on virtual devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.parallel import dist_ba, multihost
from trackingbench_slam_tpu.solvers import local_ba
from trackingbench_slam_tpu.utils.config import CameraConfig


def test_initialize_single_process_fallback(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize() is False  # no coordinator -> local mode


def test_host_mesh_layout():
    mesh = multihost.make_host_mesh()
    assert mesh.axis_names == ("dp", "lm")
    # single process: one dp row spanning every local device
    assert mesh.shape["dp"] == jax.process_count() == 1
    assert mesh.shape["lm"] == jax.local_device_count() == 8
    # lm trim
    m2 = multihost.make_host_mesh(lm_per_host=4)
    assert m2.shape["lm"] == 4
    with pytest.raises(AssertionError):
        multihost.make_host_mesh(lm_per_host=99)
    info = multihost.process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == 8


def _grouped_problem(K=4, L=64, O=4, seed=0):
    cam = cam_mod.CameraParams.from_config(
        CameraConfig(width=320, height=240, fx=300.0, fy=300.0,
                     cx=160.0, cy=120.0))
    rng = np.random.RandomState(seed)
    T_cw = []
    for k in range(K):
        xi = np.concatenate([[0.15 * k, 0, 0], rng.randn(3) * 0.01])
        T_cw.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
    T_cw = np.stack(T_cw)
    X = rng.uniform(-2, 2, (L, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 10, L)
    obs_kf = np.tile(np.arange(K, dtype=np.int32)[None, :O], (L, 1))
    px = np.zeros((L, O, 2), np.float32)
    for m in range(L):
        for k in range(O):
            pc = T_cw[k, :3, :3] @ X[m] + T_cw[k, :3, 3]
            px[m, k] = np.asarray(cam_mod.world2cam(cam, jnp.asarray(pc)))
    gp = local_ba.GroupedBAProblem(
        T_cw=jnp.asarray(T_cw, jnp.float32),
        points=jnp.asarray(X + rng.randn(L, 3).astype(np.float32) * 0.02),
        obs_kf=jnp.asarray(obs_kf),
        obs_px=jnp.asarray(px),
        obs_inv_sigma2=jnp.ones((L, O), jnp.float32),
        obs_valid=jnp.ones((L, O), bool))
    return cam, gp


def test_sharded_solve_matches_single_device_on_host_mesh():
    cam, gp = _grouped_problem()
    mesh = multihost.make_host_mesh()
    T_g, X_g = dist_ba.distributed_bundle_adjust_grouped(
        mesh, cam, gp, iters=3, num_fixed=2)
    T_1, X_1 = local_ba.bundle_adjust_grouped(cam, gp, iters=3, num_fixed=2)
    np.testing.assert_allclose(np.asarray(T_g), np.asarray(T_1), atol=5e-4)
    np.testing.assert_allclose(np.asarray(X_g), np.asarray(X_1), atol=5e-3)
