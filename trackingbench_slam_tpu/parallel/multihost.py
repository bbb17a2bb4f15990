"""Multi-host distribution: jax.distributed entry path + host-aware mesh.

The reference is single-process (SURVEY.md §2.4); the multi-host design is
ours (SURVEY §5.8 / §7 step 8): every process drives its local TPU devices,
`jax.distributed.initialize` wires the processes into one JAX runtime over
DCN, and the mesh lays the 'lm' (landmark-shard) axis over ICI-adjacent
LOCAL devices so the per-iteration psum of the reduced camera system rides
ICI; the 'dp' (data/sequence-parallel) axis spans hosts, where the only
traffic is independent work distribution — nothing latency-critical crosses
DCN.

Usage on each host (standard jax.distributed contract):

    from trackingbench_slam_tpu.parallel import multihost
    multihost.initialize(coordinator="host0:12345",
                         num_processes=4, process_id=RANK)
    mesh = multihost.make_host_mesh()     # dp = hosts, lm = local devices

A single-process run (the common case, and the only one this repo's CI can
execute) skips initialize() and gets the same mesh over local devices.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Wire this process into a multi-host JAX runtime (DCN).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can configure by
    environment alone. Returns True if distributed mode was initialized,
    False for the single-process fallback (no coordinator configured).

    Idempotent: calling again after successful initialization is a no-op.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    state = jax.distributed.global_state
    if getattr(state, "client", None) is not None:  # already initialized
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def make_host_mesh(lm_per_host: int | None = None,
                   devices=None) -> Mesh:
    """(dp=hosts, lm=local devices) mesh with 'lm' ICI-adjacent.

    Rows of the device grid are processes (hosts); columns are each host's
    local devices in jax.devices() order, which enumerates ICI neighbors
    first. The per-LM-iteration psum of the reduced camera system therefore
    reduces over 'lm' = within a host's ICI domain; 'dp' only ever carries
    independent sequences (no per-iteration collective), so DCN latency
    never sits on the solver's critical path.

    lm_per_host trims each host's column count (defaults to all local
    devices). Works identically for a single process (dp=1).
    """
    devices = devices if devices is not None else jax.devices()
    by_host: dict[int, list] = {}
    for d in devices:
        by_host.setdefault(d.process_index, []).append(d)
    hosts = sorted(by_host)
    counts = {h: len(by_host[h]) for h in hosts}
    width = min(counts.values()) if lm_per_host is None else lm_per_host
    for h in hosts:
        assert counts[h] >= width, (
            f"host {h} has {counts[h]} devices < lm_per_host={width}")
    grid = np.asarray([by_host[h][:width] for h in hosts], dtype=object)
    return Mesh(grid, axis_names=("dp", "lm"))


def process_info() -> dict:
    """Host-visible distribution summary (for logs / bench extras)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": len(jax.devices()),
    }
