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
    worker POOL. Frames may be a Sequence or any indexable; uint8 arrays
    ship 4x less transfer than f32 (make_frame converts on device).

    workers > 1 matters over a remote transport: a 453 KB uint8 KITTI frame
    measured ~33 ms to device_put — almost all round-trip LATENCY, not
    bandwidth (the tunnel moves ~100 MB/s). Serial uploads therefore cap
    the pipeline at ~30 fps no matter how fast the compute is; 3 transfers
    in flight amortize the latency to ~11 ms/frame. Left and right images
    are separate futures for the same reason."""

    def __init__(self, frames: Sequence, depth: int = 3, workers: int = 3):
        self._frames = frames
        self._depth = max(1, depth)
        self._pool = _fut.ThreadPoolExecutor(max_workers=max(1, workers))
        self._pending: dict[tuple, _fut.Future] = {}

    def _schedule(self, i: int) -> None:
        if i >= len(self._frames):
            return
        import jax
        if (i, 0) not in self._pending:
            left, right = self._frames[i]
            self._pending[(i, 0)] = self._pool.submit(jax.device_put, left)
            if right is not None:
                self._pending[(i, 1)] = self._pool.submit(
                    jax.device_put, right)

    def __getitem__(self, i: int):
        for j in range(i, i + self._depth + 1):
            self._schedule(j)
        left = self._pending.pop((i, 0)).result()
        r = self._pending.pop((i, 1), None)
        return left, (r.result() if r is not None else None)

    def __len__(self) -> int:
        return len(self._frames)

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
