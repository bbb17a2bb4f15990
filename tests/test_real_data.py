"""Real-data evaluation on the reference's bundled two-frame stereo fixture
(/root/reference/data/left.png + right.png + disparity.png) — the ONLY real
images the reference ships.

Reproduces the protocol of test_triangle (/root/reference/test/test_vo.cpp:
408-483): ORB-extract the left image (2000 features, 5 levels @ 0.8), stereo
depth by left->right LK (LocalBA::AddMapPointsByStereo, LocalBA.cpp:46-68,
depth = bf/disparity with bf = 0.573 * 718.856), then score each keypoint's
depth against the bundled disparity map used as an oracle (uint8 pixels =
disparity in px; depth_oracle = d * fx / disp, test_vo.cpp:461-463).

Additionally uses the stereo geometry itself as a pose oracle: the right
image IS the left camera translated +0.573 m along +x, so tracking
left->right through the full VO front-end must recover that translation —
a real-data accuracy gate no synthetic scene can fake.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

DATA = "/root/reference/data"
FX, FY, CX, CY = 718.856, 718.856, 607.1928, 185.2157
BASELINE = 0.573
BF = BASELINE * FX

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "disparity.png")),
    reason="reference data fixture not present")


@pytest.fixture(scope="module")
def real_pair():
    from trackingbench_slam_tpu.utils.native_loader import ImageLoader
    paths = [os.path.join(DATA, n)
             for n in ("left.png", "right.png", "disparity.png")]
    loader = ImageLoader(paths, prefetch=3)
    return loader[0], loader[1], loader[2]


@pytest.fixture(scope="module")
def cfg():
    from trackingbench_slam_tpu.utils.config import (
        CameraConfig, ExtractorConfig, MapConfig, PipelineConfig,
        PyramidConfig)
    cam = CameraConfig(width=1241, height=376, fx=FX, fy=FY, cx=CX, cy=CY,
                       bf=BF)
    return PipelineConfig(
        camera=cam,
        pyramid=PyramidConfig(num_levels=5, scale_factor=0.8),
        extractor=ExtractorConfig(num_features=2000, init_threshold=40,
                                  min_threshold=12, cell_size=24),
        map=MapConfig(max_keyframes=8, max_points=8192),
        keyframe_every=2,
    )


def test_stereo_depth_matches_disparity_oracle(real_pair, cfg):
    """test_vo.cpp:408-483 on the real fixture: mean |depth - oracle depth|
    over extracted keypoints."""
    from trackingbench_slam_tpu.geometry import camera as cam_mod
    from trackingbench_slam_tpu.geometry import triangulation as tri
    from trackingbench_slam_tpu.models.extractors import extract_orb
    from trackingbench_slam_tpu.models.frame import make_frame
    from trackingbench_slam_tpu.ops.align import lk_pyramidal

    left, right, disparity = real_pair
    cam = cam_mod.CameraParams.from_config(cfg.camera)
    f = make_frame(jnp.asarray(left), cfg.extractor.num_features,
                   cfg.pyramid.num_levels, cfg.pyramid.scale_factor)
    f = extract_orb(f, cam, cfg.extractor, cfg.pyramid)
    r = make_frame(jnp.asarray(right), 1, cfg.pyramid.num_levels,
                   cfg.pyramid.scale_factor, blur=False)
    lk = lk_pyramidal(f.lk_pyr, r.lk_pyr, f.kp_xy, f.valid, 0.5,
                      half=10, iters=30, num_levels=len(f.lk_pyr))
    lk_back = lk_pyramidal(r.lk_pyr, f.lk_pyr, lk.xy, f.valid, 0.5,
                           half=10, iters=10, num_levels=1,
                           init_offset=f.kp_xy - lk.xy)
    fb_ok = (lk_back.converged
             & (jnp.sum((lk_back.xy - f.kp_xy) ** 2, axis=-1) < 1.0))
    depth, disp_ok = tri.stereo_depth(BF, f.kp_xy[:, 0], lk.xy[:, 0])
    row_ok = jnp.abs(lk.xy[:, 1] - f.kp_xy[:, 1]) < 2.0
    ok = np.asarray(f.valid & lk.converged & fb_ok & disp_ok & row_ok
                    & (depth > 0.1) & (depth < 400.0))
    depth = np.asarray(depth)
    kp = np.asarray(f.kp_xy)

    # oracle (test_vo.cpp:459-463): uint8 disparity at the keypoint pixel
    u = np.clip(kp[:, 0].astype(int), 0, disparity.shape[1] - 1)
    v = np.clip(kp[:, 1].astype(int), 0, disparity.shape[0] - 1)
    disp_oracle = disparity[v, u].astype(np.float64)
    has_oracle = ok & (disp_oracle > 1)
    depth_oracle = BF / disp_oracle[has_oracle]

    assert has_oracle.sum() > 400, has_oracle.sum()
    err = np.abs(depth[has_oracle] - depth_oracle)
    rel = err / depth_oracle
    # the oracle itself is quantized to whole pixels of disparity (uint8
    # png): at disparity d px the oracle's own step is depth/d per px, so
    # judge relative error primarily and absolute as a sanity band
    assert np.median(rel) < 0.05, np.median(rel)
    assert (rel < 0.15).mean() > 0.85, (rel < 0.15).mean()
    assert err.mean() < 3.0, err.mean()


@pytest.mark.slow
def test_stereo_vo_recovers_baseline_on_real_pair(real_pair, cfg):
    """Full StereoVO front-end on real data: bootstrap on the left/right
    pair, then feed the RIGHT image as the next 'left' frame. Ground truth:
    a pure +0.573 m translation along +x (the rig geometry)."""
    from trackingbench_slam_tpu.models.vo import StereoVO

    left, right, _ = real_pair
    vo = StereoVO(cfg)
    vo.track(left, right)
    vo.track(right)  # camera moved exactly one baseline to the right
    T_cw = np.asarray(vo.state.T_cw)
    # camera center c = -R^T t must be (BASELINE, 0, 0)
    c = -T_cw[:3, :3].T @ T_cw[:3, 3]
    err = np.abs(c - np.array([BASELINE, 0.0, 0.0]))
    assert int(vo.state.num_inliers) > 200, int(vo.state.num_inliers)
    assert err.max() < 0.02, (c, err)  # within 2 cm on a 57.3 cm motion
    # rotation must stay near identity
    ang = np.degrees(np.arccos(np.clip((np.trace(T_cw[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
