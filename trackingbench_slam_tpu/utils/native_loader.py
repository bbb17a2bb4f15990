"""ctypes binding for the native C++ prefetching image loader
(native/src/image_loader.cpp).

Replaces the reference's synchronous per-frame cv::imread on the tracking
thread (test/test_vo.cpp:680): decode runs in a C++ thread pool that stays
`prefetch` frames ahead of the consumer. Builds the shared library on first
use if missing (g++ + libpng are part of the toolchain); falls back to
PIL/imageio decode if the build is impossible, so the pipeline never hard-
fails on loader plumbing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libtbs_native.so")

_lib = None
_build_failed = False


def _ensure_built():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.tbs_loader_create.restype = ctypes.c_void_p
        lib.tbs_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.tbs_loader_get.restype = ctypes.c_int
        lib.tbs_loader_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.tbs_loader_shape.restype = ctypes.c_int
        lib.tbs_loader_shape.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.tbs_loader_error.restype = ctypes.c_char_p
        lib.tbs_loader_error.argtypes = [ctypes.c_void_p]
        lib.tbs_loader_destroy.restype = None
        lib.tbs_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


class ImageLoader:
    """Prefetching grayscale image loader.

    >>> loader = ImageLoader(paths, prefetch=4)
    >>> img = loader[0]   # (H, W) uint8, decode already done in background
    """

    def __init__(self, paths: Sequence[str], prefetch: int = 4,
                 threads: int = 2):
        self.paths = [str(p) for p in paths]
        self._handle = None
        lib = _ensure_built()
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = lib.tbs_loader_create(arr, len(self.paths),
                                                 prefetch, threads)
            self._lib = lib

    @property
    def native(self) -> bool:
        return self._handle is not None

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self._handle is not None:
            h = ctypes.c_int()
            w = ctypes.c_int()
            rc = self._lib.tbs_loader_shape(self._handle, idx,
                                            ctypes.byref(h),
                                            ctypes.byref(w))
            if rc == 0:
                out = np.empty((h.value, w.value), np.uint8)
                rc = self._lib.tbs_loader_get(
                    self._handle, idx,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                    ctypes.byref(h), ctypes.byref(w))
                if rc == 0:
                    return out
            raise IOError(
                self._lib.tbs_loader_error(self._handle).decode() or
                f"native load failed for {self.paths[idx]}")
        return self._fallback(idx)

    def _fallback(self, idx: int) -> np.ndarray:
        path = self.paths[idx]
        if path.endswith(".npy"):
            a = np.load(path)
            return np.clip(a, 0, 255).astype(np.uint8)
        from PIL import Image
        return np.asarray(Image.open(path).convert("L"))

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            try:
                self._lib.tbs_loader_destroy(self._handle)
            except Exception:
                pass
            self._handle = None
