"""Device mesh construction for the distributed solvers.

The reference is single-process CPU with zero distributed anything
(SURVEY.md §2.4); every axis here is designed fresh for TPU:

  * 'lm'  — the landmark/observation shard axis for windowed BA. Landmarks
    and their observations live on one device; the reduced (6K, 6K) camera
    system is psum'd over this axis (riding ICI within a slice).
  * 'dp'  — frame/feature data parallelism for batched front-end work
    (multi-camera rigs, offline multi-sequence benchmarking).

Multi-host: mesh axes are laid out so 'lm' maps to ICI-adjacent devices
first (jax.make_mesh default device order), keeping the psum of the reduced
system off DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(lm: int | None = None, dp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, lm) mesh. Defaults: all devices on the 'lm' axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if lm is None:
        lm = n // dp
    assert dp * lm <= n, (dp, lm, n)
    devs = np.asarray(devices[: dp * lm]).reshape(dp, lm)
    return Mesh(devs, axis_names=("dp", "lm"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def lm_sharded(mesh: Mesh, *, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "lm"
    return NamedSharding(mesh, P(*spec))
