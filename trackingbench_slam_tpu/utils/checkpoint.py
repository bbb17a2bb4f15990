"""Checkpoint / resume of the SLAM state pytree.

The reference has no persistence at all beyond DBoW2 vocabulary save/load
(SURVEY §5.4). Here the whole tracking state — map, keyframes, pose,
trajectory — is one pytree, so checkpointing is orbax on that pytree plus
the config JSON, and resume is bit-exact.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

from trackingbench_slam_tpu.utils.config import PipelineConfig


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, cfg: PipelineConfig,
                    trajectory=None, step: int = 0) -> None:
    """Write state pytree + config. Uses orbax when importable, npz otherwise
    (both layouts carry the same data; load_checkpoint reads either)."""
    from trackingbench_slam_tpu.ops.orb import pattern_id
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())
    # descriptors inside the map/keyframe snapshots are only meaningful
    # against the pattern that produced them — record its content hash
    meta = {"step": int(step),
            "trajectory_len": 0 if trajectory is None else len(trajectory),
            "descriptor_pattern_id": pattern_id()}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if trajectory is not None and len(trajectory):
        np.save(os.path.join(path, "trajectory.npy"),
                np.asarray(jax.numpy.stack(trajectory)))
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "state"), _to_host(state), force=True)
    except Exception:
        flat, treedef = jax.tree_util.tree_flatten(_to_host(state))
        np.savez(os.path.join(path, "state.npz"),
                 **{f"leaf_{i}": leaf for i, leaf in enumerate(flat)})


def load_checkpoint(path: str, state_template: Any):
    """Restore a state pytree saved by save_checkpoint. state_template
    provides the treedef (an empty state of the same config)."""
    from trackingbench_slam_tpu.ops.orb import pattern_id
    cfg = PipelineConfig.from_json(
        open(os.path.join(path, "config.json")).read())
    meta = json.load(open(os.path.join(path, "meta.json")))
    saved_pat = meta.get("descriptor_pattern_id")
    if saved_pat is not None and saved_pat != pattern_id():
        raise ValueError(
            f"checkpoint at {path} holds descriptors extracted with BRIEF "
            f"pattern {saved_pat}, but the active pattern is {pattern_id()} "
            "— Hamming distances across patterns are meaningless; re-track "
            "or restore the matching ops/orb_pattern_learned.py")
    traj_file = os.path.join(path, "trajectory.npy")
    trajectory = np.load(traj_file) if os.path.exists(traj_file) else None
    orbax_dir = os.path.join(path, "state")
    flat_t, treedef = jax.tree_util.tree_flatten(state_template)
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(orbax_dir, item=_to_host(state_template))
        flat = jax.tree_util.tree_leaves(restored)
    else:
        z = np.load(os.path.join(path, "state.npz"))
        flat = [z[f"leaf_{i}"] for i in range(len(flat_t))]
    flat = [jax.numpy.asarray(l).astype(t.dtype)
            for l, t in zip(flat, flat_t)]
    state = jax.tree_util.tree_unflatten(treedef, flat)
    return state, cfg, trajectory, meta["step"]
