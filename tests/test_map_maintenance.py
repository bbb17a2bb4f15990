"""Live map-maintenance paths: projection-map matching (both roles), slot
purging, and duplicate fusion — the functions round 1 implemented but never
called from a pipeline (VERDICT items 4/5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.matchers import matcher as M
from trackingbench_slam_tpu.models import map as map_mod
from trackingbench_slam_tpu.models.frame import make_frame
from trackingbench_slam_tpu.utils.config import CameraConfig, MatcherConfig

CAM_CFG = CameraConfig(width=320, height=240, fx=300, fy=300, cx=160, cy=120)
CAM = cam_mod.CameraParams.from_config(CAM_CFG)


def _rand_desc(rng, n):
    return rng.randint(0, 2 ** 32, size=(n, 8),
                       dtype=np.uint64).astype(np.uint32)


def _make_map(pos_w, desc, cam_center=np.zeros(3), max_obs=4):
    """Map whose normals point from cam_center to each landmark (so a camera
    near cam_center passes the view-angle gate)."""
    Mn = pos_w.shape[0]
    m = map_mod.empty_map(Mn + 8, max_obs)
    normal = pos_w - cam_center[None, :]
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    dist = np.linalg.norm(pos_w - cam_center[None, :], axis=-1)
    m, slots = map_mod.add_points(
        m, jnp.asarray(pos_w, jnp.float32), jnp.asarray(desc),
        jnp.asarray(normal, jnp.float32),
        jnp.asarray(dist * 0.2, jnp.float32),
        jnp.asarray(dist * 5.0, jnp.float32),
        jnp.zeros((Mn,), jnp.int32), jnp.zeros((Mn,), jnp.int32),
        jnp.ones((Mn,), bool))
    return m, np.asarray(slots)


def _frame_with_features(kp_xy, desc, map_idx=None, n_cap=32):
    f = make_frame(jnp.zeros((240, 320), jnp.float32), n_cap, 2, 0.8,
                   blur=False)
    n = kp_xy.shape[0]
    pad = n_cap - n
    f = f._replace(
        kp_xy=jnp.asarray(np.pad(kp_xy, ((0, pad), (0, 0))), jnp.float32),
        desc=jnp.asarray(np.pad(desc, ((0, pad), (0, 0)))),
        kp_level=jnp.zeros((n_cap,), jnp.int32),
        valid=jnp.asarray(np.arange(n_cap) < n),
        map_idx=jnp.asarray(
            np.pad(map_idx if map_idx is not None else -np.ones(n, int),
                   (0, pad), constant_values=-1), jnp.int32))
    return f


def test_search_by_projection_map_direct(rng):
    """Landmarks projected into a frame match the features sitting at their
    projections with the same descriptors — the direct accuracy test the
    map variant lacked in round 1."""
    n = 12
    # landmarks 4-8 m in front of an identity camera
    xn = (rng.rand(n) - 0.5) * 0.8
    yn = (rng.rand(n) - 0.5) * 0.6
    z = 4.0 + 4.0 * rng.rand(n)
    pos_w = np.stack([xn * z, yn * z, z], axis=-1)
    desc = _rand_desc(rng, n)
    m, slots = _make_map(pos_w, desc)

    proj = np.stack([300 * xn + 160, 300 * yn + 120], axis=-1)
    # features at the projections (plus sub-pixel jitter), same descriptors
    f = _frame_with_features(proj + rng.randn(n, 2) * 0.5, desc)
    res = M.search_by_projection_map(CAM, f, m, MatcherConfig(),
                                     scale_factor=0.8, num_levels=2)
    ok = np.asarray(res.ok)[:n]
    idx = np.asarray(res.idx)[:n]
    assert ok.all(), ok
    assert (idx == slots[:n]).all(), (idx, slots)


def test_projection_map_only_unlinked_flag(rng):
    n = 6
    z = np.full(n, 5.0)
    xn = np.linspace(-0.3, 0.3, n)
    pos_w = np.stack([xn * z, np.zeros(n), z], axis=-1)
    desc = _rand_desc(rng, n)
    m, slots = _make_map(pos_w, desc)
    proj = np.stack([300 * xn + 160, np.full(n, 120.0)], axis=-1)
    map_idx = -np.ones(n, int)
    map_idx[0] = slots[0]  # feature 0 already linked
    f = _frame_with_features(proj, desc, map_idx)
    res_u = M.search_by_projection_map(CAM, f, m, MatcherConfig(),
                                       scale_factor=0.8, num_levels=2,
                                       only_unlinked=True)
    res_all = M.search_by_projection_map(CAM, f, m, MatcherConfig(),
                                         scale_factor=0.8, num_levels=2,
                                         only_unlinked=False)
    assert not np.asarray(res_u.ok)[0]      # linked feature excluded
    assert np.asarray(res_all.ok)[0]        # included in fusion mode
    assert np.asarray(res_all.idx)[0] == slots[0]


def test_purge_kf_slot():
    m = map_mod.empty_map(8, 4)
    m, slots = map_mod.add_points(
        m, jnp.zeros((2, 3)), jnp.zeros((2, 8), jnp.uint32),
        jnp.zeros((2, 3)), jnp.zeros((2,)), jnp.ones((2,)),
        jnp.asarray([2, 3], jnp.int32), jnp.zeros((2,), jnp.int32),
        jnp.ones((2,), bool))
    m = map_mod.add_observations(m, jnp.asarray(slots), 2,
                                 jnp.asarray([5, 6], jnp.int32),
                                 jnp.ones((2,), bool))
    m = map_mod.add_observations(m, jnp.asarray(slots), 3,
                                 jnp.asarray([7, 8], jnp.int32),
                                 jnp.ones((2,), bool))
    m2 = map_mod.purge_kf_slot(m, jnp.asarray(2, jnp.int32),
                               jnp.asarray(True))
    obs_kf = np.asarray(m2.obs_kf)[np.asarray(slots)]
    assert not (obs_kf == 2).any()
    assert (obs_kf == 3).sum() == 2  # other keyframe's obs survive
    ref = np.asarray(m2.ref_kf)[np.asarray(slots)]
    assert ref[0] == -1 and ref[1] == 3  # dead ref dropped, live ref kept
    # want=False is a no-op
    m3 = map_mod.purge_kf_slot(m, jnp.asarray(2, jnp.int32),
                               jnp.asarray(False))
    assert (np.asarray(m3.obs_kf) == np.asarray(m.obs_kf)).all()


@pytest.mark.slow
def test_keyframe_step_fuses_duplicates(rng):
    """Pipeline-level fusion: seed the map with a duplicate pair (same
    position, same descriptor), track a frame whose feature is linked to one
    of them; after keyframe_step the duplicate must be dead and links
    redirected to the survivor."""
    from trackingbench_slam_tpu.models import vo as vo_mod
    from trackingbench_slam_tpu.utils.config import (
        ExtractorConfig, MapConfig, PipelineConfig, PyramidConfig)
    from tests.conftest import make_textured_image

    cfg = PipelineConfig(
        camera=CameraConfig(width=320, height=240, fx=300, fy=300,
                            cx=160, cy=120, bf=300 * 0.2),
        pyramid=PyramidConfig(num_levels=2, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=64, min_threshold=10,
                                  cell_size=40),
        map=MapConfig(max_keyframes=4, max_points=256, max_obs_per_point=4),
        keyframe_every=2)
    img = make_textured_image(240, 320, seed=21)
    state = vo_mod.init_state(cfg, jnp.asarray(img, jnp.float32))
    cam = cam_mod.CameraParams.from_config(cfg.camera)

    # plant a landmark pair: two slots, same world point, same descriptor
    z = 6.0
    u, v = 200.0, 140.0
    pw = np.array([[(u - 160) / 300 * z, (v - 120) / 300 * z, z]] * 2,
                  np.float32)
    desc = np.tile(_rand_desc(rng, 1), (2, 1))
    m, slots = map_mod.add_points(
        state.map, jnp.asarray(pw), jnp.asarray(desc),
        jnp.asarray([[0, 0, 1.0]] * 2, jnp.float32),
        jnp.asarray([1.0, 1.0]), jnp.asarray([30.0, 30.0]),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
        jnp.ones((2,), bool))
    # give the keeper more observations so the direction is deterministic
    m = map_mod.add_observations(m, slots[:1], 0, jnp.asarray([0], jnp.int32),
                                 jnp.ones((1,), bool))
    # frame: one feature at the projection linked to the LOSER slot
    f = state.prev
    f = f._replace(
        kp_xy=f.kp_xy.at[0].set(jnp.asarray([u, v])),
        desc=f.desc.at[0].set(jnp.asarray(desc[0])),
        kp_level=f.kp_level.at[0].set(0),
        valid=f.valid.at[0].set(True),
        map_idx=f.map_idx.at[0].set(slots[1]))
    state = state._replace(map=m, prev=f)
    state = vo_mod.keyframe_step(state, jnp.asarray(img, jnp.float32),
                                 cam, cfg)
    valid = np.asarray(state.map.valid)
    s0, s1 = int(slots[0]), int(slots[1])
    assert valid[s0] and not valid[s1], (valid[s0], valid[s1])
    # the frame's link was redirected to the survivor
    assert int(np.asarray(state.prev.map_idx)[0]) == s0
