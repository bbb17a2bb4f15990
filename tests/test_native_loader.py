"""Native C++ loader tests: build, decode correctness vs PIL, prefetch
behavior, error paths."""

import os

import numpy as np
import pytest
from PIL import Image

from trackingbench_slam_tpu.utils.native_loader import ImageLoader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    r = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = (r.rand(48, 64) * 255).astype(np.uint8)
        p = d / f"{i:04d}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    # one RGB png (loader must gray-convert)
    rgb = (r.rand(32, 40, 3) * 255).astype(np.uint8)
    prgb = d / "rgb.png"
    Image.fromarray(rgb).save(prgb)
    paths.append(str(prgb))
    # one pgm
    gray = (r.rand(24, 30) * 255).astype(np.uint8)
    ppgm = d / "img.pgm"
    with open(ppgm, "wb") as f:
        f.write(b"P5\n# comment\n30 24\n255\n")
        f.write(gray.tobytes())
    paths.append(str(ppgm))
    # one npy
    pnpy = d / "img.npy"
    np.save(pnpy, gray.astype(np.float32))
    paths.append(str(pnpy))
    return paths, gray, rgb


def test_native_builds_and_decodes_png(image_dir):
    paths, gray, rgb = image_dir
    loader = ImageLoader(paths, prefetch=3, threads=2)
    assert loader.native, "native library failed to build"
    for i in range(6):
        ref = np.asarray(Image.open(paths[i]).convert("L"))
        got = loader[i]
        np.testing.assert_array_equal(got, ref)


def test_rgb_to_gray(image_dir):
    paths, gray, rgb = image_dir
    loader = ImageLoader(paths)
    got = loader[6]
    ref = (rgb[..., 0].astype(np.int64) * 299 + rgb[..., 1].astype(np.int64) * 587
           + rgb[..., 2].astype(np.int64) * 114) // 1000
    assert got.shape == ref.shape
    assert np.abs(got.astype(np.int64) - ref).max() <= 1


def test_pgm_and_npy(image_dir):
    paths, gray, rgb = image_dir
    loader = ImageLoader(paths)
    np.testing.assert_array_equal(loader[7], gray)
    np.testing.assert_array_equal(loader[8], gray)


def test_missing_file_errors(tmp_path):
    loader = ImageLoader([str(tmp_path / "nope.png")])
    if loader.native:
        with pytest.raises(IOError):
            loader[0]


def test_out_of_order_access(image_dir):
    paths, _, _ = image_dir
    loader = ImageLoader(paths[:6], prefetch=2)
    ref4 = np.asarray(Image.open(paths[4]).convert("L"))
    np.testing.assert_array_equal(loader[4], ref4)
    # going backward after eviction must still work (re-decode)
    ref1 = np.asarray(Image.open(paths[1]).convert("L"))
    np.testing.assert_array_equal(loader[1], ref1)
