"""Device-upload prefetcher: take the host->device image transfer off the
tracking thread (VERDICT r4 next #2).

The per-frame upload costs ~2x the tracking compute over a remote transport
(BENCH_r04: device_put_image_ms 32.1 vs track_step_ms 15.4) and the
reference pays the same cost synchronously (cv::imread + implicit upload,
test/test_vo.cpp:680-685). `jax.device_put` can block on the transfer, so
queueing puts on the tracking thread only reorders the stall — the fix is a
worker THREAD: frame t+1's transfer rides the tunnel/PCIe while frame t's
programs run, and the tracking thread only joins a future that is almost
always already resolved.

Composes with utils/native_loader.ImageLoader (which prefetches the DECODE
side): loader -> DevicePrefetcher -> StereoVO covers disk->host->device.

Usage:
    pf = DevicePrefetcher(frames, depth=2)      # frames: [(L, R|None), ...]
    for i in range(len(frames)):
        vo.track(*pf[i])                        # device arrays, no stall
"""

from __future__ import annotations

import concurrent.futures as _fut
from typing import Optional, Sequence


class DevicePrefetcher:
    """Upload (left, right|None) frame pairs `depth` frames ahead on a
    worker thread. Frames may be a Sequence or any indexable; uint8 arrays
    ship 4x less transfer than f32 (make_frame converts on device)."""

    def __init__(self, frames: Sequence, depth: int = 2):
        self._frames = frames
        self._depth = max(1, depth)
        self._pool = _fut.ThreadPoolExecutor(max_workers=1)
        self._pending: dict[int, _fut.Future] = {}
        self._next = 0

    @staticmethod
    def _put(pair):
        import jax
        left, right = pair
        return (jax.device_put(left),
                jax.device_put(right) if right is not None else None)

    def _schedule(self, i: int) -> None:
        if i < len(self._frames) and i not in self._pending:
            self._pending[i] = self._pool.submit(
                self._put, self._frames[i])

    def __getitem__(self, i: int):
        for j in range(i, i + self._depth + 1):
            self._schedule(j)
        return self._pending.pop(i).result()

    def __len__(self) -> int:
        return len(self._frames)

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
