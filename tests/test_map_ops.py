"""Map-store operation tests: observations, distinctive descriptors,
normals/scale bands, replace/fuse, scale prediction, vocabulary save/load,
image undistortion."""

import numpy as np
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.models import map as map_mod
from trackingbench_slam_tpu.utils.config import CameraConfig


def _mini_map(rng, M=16, K=4):
    m = map_mod.empty_map(M, K)
    pos = rng.rand(8, 3).astype(np.float32) + np.array([0, 0, 5], np.float32)
    desc = rng.randint(0, 2 ** 32, (8, 8), dtype=np.uint64).astype(np.uint32)
    want = np.ones(8, bool)
    m, slots = map_mod.add_points(
        m, jnp.asarray(pos), jnp.asarray(desc),
        jnp.zeros((8, 3), jnp.float32), jnp.ones((8,), jnp.float32),
        jnp.full((8,), 10.0, jnp.float32),
        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32),
        jnp.asarray(want))
    return m, np.asarray(slots), pos, desc


def test_add_and_erase(rng):
    m, slots, pos, desc = _mini_map(rng)
    assert int(m.num_valid()) == 8
    np.testing.assert_allclose(np.asarray(m.pos)[slots], pos, atol=1e-6)
    m2 = map_mod.erase_points(m, jnp.asarray(slots[:3]), jnp.ones(3, bool))
    assert int(m2.num_valid()) == 5


def test_replace_merges_and_redirects(rng):
    m, slots, pos, desc = _mini_map(rng)
    m = m._replace(n_found=m.n_found.at[slots[0]].set(7),
                   n_visible=m.n_visible.at[slots[0]].set(9))
    old = jnp.asarray([slots[0]])
    new = jnp.asarray([slots[1]])
    m2, redirect = map_mod.replace_points(m, old, new, jnp.ones(1, bool))
    assert not bool(m2.valid[slots[0]])
    assert bool(m2.valid[slots[1]])
    assert int(m2.n_found[slots[1]]) == int(m.n_found[slots[1]]) + 7
    r = np.asarray(redirect)
    assert r[slots[0]] == slots[1]
    assert r[slots[2]] == slots[2]
    # frame link rewrite pattern
    map_idx = np.asarray([slots[0], slots[2], -1])
    rewritten = np.where(map_idx >= 0, r[np.clip(map_idx, 0, None)], -1)
    assert rewritten[0] == slots[1] and rewritten[1] == slots[2]


def test_observation_roundtrip_and_descriptors(rng):
    m, slots, pos, desc = _mini_map(rng)
    kfs = map_mod.empty_keyframes(4, 32)
    # fake one keyframe holding features whose descriptors we know
    kf_desc = rng.randint(0, 2 ** 32, (32, 8), dtype=np.uint64).astype(np.uint32)
    kfs = kfs._replace(desc=kfs.desc.at[0].set(jnp.asarray(kf_desc)),
                       valid=kfs.valid.at[0].set(True))
    feat = jnp.arange(8, dtype=jnp.int32)
    m = map_mod.add_observations(m, jnp.asarray(slots), jnp.asarray(0),
                                 feat, jnp.ones(8, bool),
                                 desc=jnp.asarray(kf_desc[:8]))
    assert (np.asarray(m.obs_count)[slots] == 1).all()
    m = map_mod.compute_distinctive_descriptors(m, kfs)
    # single observation -> representative descriptor is that observation
    np.testing.assert_array_equal(np.asarray(m.desc)[slots], kf_desc[:8])


def test_distinctive_descriptor_median_selection(rng):
    """Three observations: two near-identical, one far. The representative
    must be one of the close pair (min median Hamming distance to the
    others) — exercises the obs_desc table across multiple keyframes
    (MapPoint::ComputeDistinctiveDescriptors, MapPoint.cpp:253-318)."""
    m = map_mod.empty_map(8, 4)
    kfs = map_mod.empty_keyframes(4, 8)
    base = rng.randint(0, 2 ** 32, (8,), dtype=np.uint64).astype(np.uint32)
    near = base.copy()
    near[0] ^= np.uint32(1)          # Hamming distance 1 from base
    far = (~base).astype(np.uint32)  # Hamming distance 256 from base
    m, slots = map_mod.add_points(
        m, jnp.zeros((1, 3)), jnp.asarray(far[None]),
        jnp.zeros((1, 3)), jnp.zeros((1,)), jnp.ones((1,)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), bool))
    one = jnp.ones((1,), bool)
    f0 = jnp.zeros((1,), jnp.int32)
    for kf, d in [(0, far), (1, base), (2, near)]:
        m = map_mod.add_observations(m, jnp.asarray(slots),
                                     jnp.asarray(kf, jnp.int32), f0, one,
                                     desc=jnp.asarray(d[None]))
    m = map_mod.compute_distinctive_descriptors(m, kfs)
    got = np.asarray(m.desc)[slots[0]]
    assert (got == base).all() or (got == near).all()


def test_predict_scale():
    m = map_mod.empty_map(4, 2)
    m = m._replace(max_dist=jnp.asarray([10.0, 10.0, 10.0, 10.0]))
    lv = map_mod.predict_scale(m, jnp.asarray([10.0, 5.0, 2.0, 0.1]),
                               scale_factor=0.5, num_levels=4)
    assert list(np.asarray(lv)) == [0, 1, 3, 3]


def test_vocabulary_save_load(rng, tmp_path):
    from trackingbench_slam_tpu.bow import vocabulary as bow
    descs = rng.randint(0, 2 ** 32, (300, 8), dtype=np.uint64).astype(np.uint32)
    voc = bow.train(descs, branching=4, depth=3, seed=1)
    p = str(tmp_path / "voc.npz")
    bow.save_vocabulary(voc, p)
    voc2 = bow.load_vocabulary(p)
    w1, n1 = bow.transform(voc, jnp.asarray(descs[:50]), jnp.ones(50, bool))
    w2, n2 = bow.transform(voc2, jnp.asarray(descs[:50]), jnp.ones(50, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_undistort_image_straightens(rng):
    """Undistorting a distorted render of a straight-edge pattern restores
    straightness along the central row."""
    cfg = CameraConfig(width=128, height=96, fx=100, fy=100, cx=64, cy=48,
                       k1=-0.3, k2=0.05)
    cam = cam_mod.CameraParams.from_config(cfg)
    # build a distorted image by sampling an ideal vertical-stripe pattern
    # at distorted positions (i.e., what a distorted camera sees)
    ys, xs = np.mgrid[0:96, 0:128].astype(np.float32)
    # physical distorted image: I_d(p) = ideal(undistort(p)), so that
    # undistort_image's gather I_d(distort(p)) returns ideal(p)
    und_px = np.asarray(cam_mod.undistort_points(
        cam, jnp.asarray(np.stack([xs, ys], -1))))
    ideal = lambda u: (np.sin(u * 0.5) * 100 + 100)
    distorted = ideal(und_px[..., 0])
    und = np.asarray(cam_mod.undistort_image(cam, jnp.asarray(distorted)))
    ref = ideal(xs)
    center = np.abs(und[40:56, 20:108] - ref[40:56, 20:108])
    assert np.median(center) < 2.0, np.median(center)
