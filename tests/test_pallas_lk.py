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
