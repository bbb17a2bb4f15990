"""Patch-extraction kernel + gather-free ORB math (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from trackingbench_slam_tpu.ops import orb as orb_ops
from trackingbench_slam_tpu.ops.pallas.patch_kernel import (
    PATCH, brief_from_patches, extract_patches32, ic_angle_from_patches)
from tests.conftest import make_textured_image


def _setup(n=24, seed=5):
    img = make_textured_image(200, 300, seed=seed)
    r = np.random.RandomState(seed)
    pts = np.stack([r.uniform(20, 280, n), r.uniform(20, 180, n)],
                   axis=-1).astype(np.float32)
    valid = np.ones(n, bool)
    return img, pts, valid


def test_patches_match_direct_crop():
    img, pts, valid = _setup()
    patches = np.asarray(extract_patches32(
        jnp.asarray(img), jnp.asarray(pts), jnp.asarray(valid),
        interpret=True))
    for i in range(pts.shape[0]):
        cx, cy = int(round(pts[i, 0])), int(round(pts[i, 1]))
        ref = img[cy - 15:cy + 17, cx - 15:cx + 17]
        np.testing.assert_allclose(patches[i, :, :PATCH], ref, atol=1e-4)


def test_ic_angle_matches_gather_path():
    img, pts, valid = _setup()
    patches = extract_patches32(jnp.asarray(img), jnp.asarray(pts),
                                jnp.asarray(valid), interpret=True)
    a1 = np.asarray(ic_angle_from_patches(patches))
    a2 = np.asarray(orb_ops.ic_angle(jnp.asarray(img), jnp.asarray(pts),
                                     jnp.asarray(valid)))
    d = np.abs(np.angle(np.exp(1j * (a1 - a2))))
    assert d.max() < 1e-3, d.max()


def test_brief_close_to_continuous_rotation():
    img, pts, valid = _setup(n=32, seed=9)
    from trackingbench_slam_tpu.ops.image import gaussian_blur
    blur = gaussian_blur(jnp.asarray(img))
    angles = orb_ops.ic_angle(blur, jnp.asarray(pts), jnp.asarray(valid))
    d_ref = np.asarray(orb_ops.brief_descriptors(blur, jnp.asarray(pts),
                                                 angles, jnp.asarray(valid)))
    patches = extract_patches32(blur, jnp.asarray(pts), jnp.asarray(valid),
                                interpret=True)
    d_new = np.asarray(brief_from_patches(patches, angles,
                                          jnp.asarray(valid)))
    # angle quantization (11.25 deg) flips a minority of near-tie bits
    x = d_ref ^ d_new
    ham = np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)
    assert np.median(ham) < 40, (np.median(ham), ham.max())
    # and identical-descriptor matching still works: distance to OTHER
    # keypoints' descriptors is far larger
    from trackingbench_slam_tpu.ops.hamming import hamming_matrix_popcount
    D = np.asarray(hamming_matrix_popcount(jnp.asarray(d_new),
                                           jnp.asarray(d_ref)))
    diag = np.diag(D)
    off = D + np.eye(D.shape[0]) * 1000
    assert (diag < off.min(axis=1)).mean() > 0.95
