"""Pallas LK kernel vs the XLA align_patches implementation (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from trackingbench_slam_tpu.ops.align import (align_patches,
                                              template_patches_and_grads)
from trackingbench_slam_tpu.ops.pallas.lk_kernel import patch_align_pallas
from tests.conftest import make_textured_image


def _pair(dx=2.3, dy=-1.4, seed=13):
    from trackingbench_slam_tpu.ops.image import gaussian_blur
    img = make_textured_image(120, 160, seed=seed, blobs=200)
    img = np.asarray(gaussian_blur(jnp.asarray(img), 5, 1.0))
    # subpixel shift by bilinear resample
    ys, xs = np.mgrid[0:120, 0:160].astype(np.float64)
    xs2 = np.clip(xs + dx, 0, 159)
    ys2 = np.clip(ys + dy, 0, 119)
    x0 = xs2.astype(int)
    y0 = ys2.astype(int)
    fx = xs2 - x0
    fy = ys2 - y0
    x1 = np.clip(x0 + 1, 0, 159)
    y1 = np.clip(y0 + 1, 0, 119)
    img2 = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
            + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    return img.astype(np.float32), img2.astype(np.float32)


def test_pallas_lk_tracks_shift():
    dx, dy = 2.3, -1.4
    img1, img2 = _pair(dx, dy)
    r = np.random.RandomState(0)
    pts = np.stack([r.uniform(30, 130, 32), r.uniform(30, 90, 32)],
                   axis=-1).astype(np.float32)
    valid = np.ones(32, bool)
    xy, conv, err = patch_align_pallas(
        jnp.asarray(img2), jnp.asarray(img1), jnp.asarray(pts),
        jnp.asarray(pts), jnp.asarray(valid), half=7, iters=30,
        conv_eps=0.01, interpret=True)
    conv = np.asarray(conv)
    flow = np.asarray(xy) - pts
    assert conv.mean() > 0.8, conv.mean()
    # template lives in img2 (img2(q) = img1(q + d)), so tracked flow = +d
    good = np.abs(flow[conv] - [dx, dy]) < 0.15
    assert good.all(axis=1).mean() > 0.85, flow[conv][:5]


def test_pallas_lk_matches_xla_path():
    img1, img2 = _pair(1.2, 0.8, seed=14)
    r = np.random.RandomState(1)
    pts = np.stack([r.uniform(30, 130, 24), r.uniform(30, 90, 24)],
                   axis=-1).astype(np.float32)
    valid = np.ones(24, bool)
    half = 7
    tpl, tgrad = template_patches_and_grads(jnp.asarray(img1),
                                            jnp.asarray(pts), half)
    res = align_patches(jnp.asarray(img2), tpl, tgrad, jnp.asarray(pts),
                        jnp.asarray(valid), half=half, iters=30,
                        conv_eps=0.01, with_illum=True)
    xy_p, conv_p, _ = patch_align_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(pts),
        jnp.asarray(pts), jnp.asarray(valid), half=half, iters=30,
        conv_eps=0.01, interpret=True)
    both = np.asarray(res.converged) & np.asarray(conv_p)
    assert both.mean() > 0.7
    d = np.abs(np.asarray(res.xy)[both] - np.asarray(xy_p)[both])
    assert np.median(d) < 0.05, np.median(d)


def test_pallas_lk_invalid_passthrough():
    img1, img2 = _pair()
    pts = np.asarray([[50.0, 50.0], [80.0, 40.0]], np.float32)
    valid = np.asarray([True, False])
    xy, conv, err = patch_align_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(pts),
        jnp.asarray(pts), jnp.asarray(valid), half=7, iters=10,
        interpret=True)
    assert not bool(conv[1])


def test_pallas_lk_border_points():
    img1, img2 = _pair()
    pts = np.asarray([[3.0, 3.0], [158.0, 118.0], [80.0, 60.0]], np.float32)
    valid = np.ones(3, bool)
    xy, conv, err = patch_align_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(pts),
        jnp.asarray(pts), jnp.asarray(valid), half=7, iters=10,
        interpret=True)
    # border points must not report convergence to garbage
    assert not bool(conv[0])
    assert not bool(conv[1])


def test_fused_fb_check_accepts_good_rejects_flat():
    """fb_iters > 0 returns a forward-backward verdict from the SAME kernel
    launch: textured points that track cleanly pass (back-track returns
    sub-pixel); points in a flat region — whose forward 'convergence' is
    meaningless — must fail the round trip or report a large distance."""
    import numpy as np
    import jax.numpy as jnp
    from trackingbench_slam_tpu.ops.pallas.lk_kernel import patch_align_pallas
    from tests.conftest import make_textured_image

    img1 = make_textured_image(240, 320, seed=4)
    # pure translation via roll keeps texture identical
    img2 = np.roll(np.roll(img1, 2, axis=0), 3, axis=1)
    # right half of img2 REPLACED with unrelated texture: forward LK locks
    # onto spurious local minima there, and only the round trip exposes it
    img2[:, 200:] = make_textured_image(240, 320, seed=99)[:, 200:]
    r = np.random.RandomState(6)
    good = np.stack([r.uniform(40, 180, 12), r.uniform(30, 210, 12)], -1)
    flat = np.stack([r.uniform(230, 300, 12), r.uniform(80, 160, 12)], -1)
    pts = np.concatenate([good, flat]).astype(np.float32)
    valid = np.ones(len(pts), bool)
    xy, conv, err, fb_conv, fb_d2 = patch_align_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(pts),
        jnp.asarray(pts), jnp.asarray(valid), half=10, iters=30,
        fb_iters=10, interpret=True)
    xy, conv = np.asarray(xy), np.asarray(conv)
    fb_conv, fb_d2 = np.asarray(fb_conv), np.asarray(fb_d2)
    fb_ok = fb_conv & (fb_d2 < 1.0)
    n_good = len(good)
    # good points: tracked to the (3, 2) shift and round-trip verified
    got = conv[:n_good] & fb_ok[:n_good]
    assert got.mean() > 0.8, got
    land = xy[:n_good][got[:len(good)]] - pts[:n_good][got]
    np.testing.assert_allclose(land, np.tile([[3.0, 2.0]], (got.sum(), 1)),
                               atol=0.1)
    # the fb verdict must reject most of the changed-texture points whose
    # forward pass "converged" onto spurious matches
    bad_fwd = conv[n_good:]
    bad_ok = fb_ok[n_good:]
    if bad_fwd.sum() > 0:
        assert bad_ok.sum() <= max(1, bad_fwd.sum() // 2), (bad_fwd.sum(),
                                                            bad_ok.sum())
