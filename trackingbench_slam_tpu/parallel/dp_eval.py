"""Data-parallel front-end evaluation over the 'dp' mesh axis.

This is the workload the repo is named after — benchmarking tracking — run
the TPU way: B independent sequences (or B parameterizations of one
sequence) step TOGETHER as one vmapped device program, with the batch axis
sharded over 'dp' (SURVEY §7.8's "features/frames data-parallel axis"; the
reference processes exactly one stream on one core, test/test_vo.cpp:674).

Because vo.track_step is a pure function of (VOState, image), data
parallelism is literally `vmap` + an input sharding: XLA partitions the
batched program over the mesh with zero cross-device communication (the
sequences are independent), so scaling is embarrassingly linear and the
per-device program is byte-identical to the single-sequence one.

Usage:
    mesh   = make_mesh(lm=1, dp=8)
    states = stack_states([init0, ..., init7])       # batched pytree
    states = shard_batch(mesh, states)
    states = dp_track_step(states, imgs, cam, cfg)   # imgs (B, H, W)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trackingbench_slam_tpu.models import vo as vo_mod


def stack_states(states: list) -> vo_mod.VOState:
    """Stack B per-sequence VOStates into one batched pytree (axis 0 = B)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(batched: vo_mod.VOState, b: int) -> list:
    return [jax.tree_util.tree_map(lambda x: x[i], batched)
            for i in range(b)]


def shard_batch(mesh: Mesh, tree):
    """Place a batched pytree with axis 0 sharded over 'dp' (other axes
    replicated; scalars-per-sequence shard their only axis)."""
    return jax.device_put(tree, NamedSharding(mesh, P("dp")))


@functools.partial(jax.jit, static_argnames=("cfg",))
def dp_track_step(states: vo_mod.VOState, imgs: jax.Array, cam,
                  cfg) -> vo_mod.VOState:
    """One tracking step for all B sequences at once. Input shardings (from
    shard_batch) make XLA run each sequence's program on its 'dp' device."""
    return jax.vmap(vo_mod.track_step,
                    in_axes=(0, 0, None, None))(states, imgs, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def dp_track_and_keyframe_step(states: vo_mod.VOState, imgs_l: jax.Array,
                               imgs_r: jax.Array, cam, cfg) -> vo_mod.VOState:
    """Keyframe-cadence frames for all B sequences (track + stereo map)."""
    return jax.vmap(vo_mod.track_and_keyframe_step,
                    in_axes=(0, 0, 0, None, None))(states, imgs_l, imgs_r,
                                                   cam, cfg)
