"""FrameState — the struct-of-arrays replacement for the reference Frame class.

Reference Frame (include/types/Frame.h:28-202, src/types/Frame.cpp) is a
pointer-rich per-image object: vector<Feature> with per-feature MapPoint
pointers, a 120x36 occupancy grid, mutex-guarded SE3 pose, image pyramid, BoW
vectors. Here a frame is an immutable pytree of fixed-capacity arrays:

  * pyramid          — tuple of (H_l, W_l) float32, level 0 full-res
                       (Frame::ComputePyramid, Frame.cpp:414-451)
  * kp_xy (N, 2)     — level-0 pixel coords (Feature::px)
  * kp_level (N,)    — pyramid level (cv::KeyPoint::octave)
  * kp_angle (N,)    — orientation radians (KeyPoint::angle)
  * kp_response (N,) — detector response
  * desc (N, 8)      — 256-bit descriptors as uint32 words
  * bearing (N, 3)   — unit bearing vectors (Feature::f, Frame.cpp:104-110)
  * map_idx (N,)     — landmark slot in MapState, -1 = none
                       (Frame::mvpMapPoints nullptr convention)
  * valid (N,)       — slot occupancy mask
  * T_cw (4, 4)      — world->camera pose (Frame::SetPose, Frame.cpp:51-66)

The reference's feature grid (AssignFeaturesToGrid / GetFeaturesInArea,
Frame.cpp:187-265) exists to prune candidate pairs on a CPU; on TPU the full
masked distance matrix is cheaper than gather-heavy bucketing, so windowed
searches express the grid as a |Δpx| < r mask inside the match kernel instead.

No mutexes: state is functional; a new FrameState is produced by every update
(the reference's mMutexPose/mMutexFeatures protect exactly the mutation this
design removes).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.ops.image import build_pyramid


class FrameState(NamedTuple):
    pyramid: Tuple[jax.Array, ...]
    lk_pyr: Tuple[jax.Array, ...]   # dedicated scale-0.5 pyramid for LK
    # (cv::calcOpticalFlowPyrLK builds its own half-scale pyramid internally;
    # the frame pyramid's 0.8 factor gives LK almost no convergence range)
    kp_xy: jax.Array
    kp_level: jax.Array
    kp_angle: jax.Array
    kp_response: jax.Array
    desc: jax.Array
    bearing: jax.Array
    map_idx: jax.Array
    valid: jax.Array
    T_cw: jax.Array

    @property
    def capacity(self) -> int:
        return self.kp_xy.shape[0]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)

    def T_wc(self) -> jax.Array:
        return se3.inverse(self.T_cw)

    def set_pose(self, T_cw: jax.Array) -> "FrameState":
        return self._replace(T_cw=T_cw)


def empty_features(capacity: int, dtype=jnp.float32):
    return dict(
        kp_xy=jnp.full((capacity, 2), -1.0, dtype),
        kp_level=jnp.zeros((capacity,), jnp.int32),
        kp_angle=jnp.zeros((capacity,), dtype),
        kp_response=jnp.zeros((capacity,), dtype),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        bearing=jnp.zeros((capacity, 3), dtype),
        map_idx=jnp.full((capacity,), -1, jnp.int32),
        valid=jnp.zeros((capacity,), bool),
    )


LK_LEVELS = 4  # half-scale LK pyramid depth (cv::calcOpticalFlowPyrLK default 3+1)


def make_frame(img: jax.Array, capacity: int, num_levels: int, scale: float,
               T_cw: jax.Array | None = None,
               blur: bool = False) -> FrameState:
    """Build pyramid + empty feature arrays (Frame ctor, Frame.cpp:13-33).

    The 7x7 descriptor blur (ORBextractor.cpp:884,960) is NOT computed
    here: only keyframes extract descriptors, so extract_orb blurs its own
    levels on demand — tracking frames save ~3 ms/frame. `blur` is accepted
    for backward compatibility and ignored."""
    del blur
    img = img.astype(jnp.float32)
    pyr = tuple(build_pyramid(img, num_levels, scale))
    lk_pyr = tuple(build_pyramid(img, LK_LEVELS, 0.5))
    feats = empty_features(capacity, img.dtype)
    if T_cw is None:
        T_cw = jnp.eye(4, dtype=jnp.float32)
    return FrameState(pyramid=pyr, lk_pyr=lk_pyr, T_cw=T_cw, **feats)


def with_keypoints(frame: FrameState, cam: cam_mod.CameraParams,
                   kp_xy: jax.Array, kp_level: jax.Array, kp_angle: jax.Array,
                   kp_response: jax.Array, desc: jax.Array,
                   valid: jax.Array) -> FrameState:
    """Install an extraction result (Frame::SetKeys, Frame.cpp:94-116 —
    including the bearing-vector computation via Cam2World)."""
    bearing = cam_mod.cam2world(cam, kp_xy)
    bearing = jnp.where(valid[:, None], bearing, 0.0)
    return frame._replace(
        kp_xy=kp_xy, kp_level=kp_level, kp_angle=kp_angle,
        kp_response=kp_response, desc=desc, valid=valid,
        bearing=bearing,
        map_idx=jnp.where(valid, frame.map_idx, -1),
    )


def add_keypoints(frame: FrameState, cam: cam_mod.CameraParams,
                  kp_xy: jax.Array, kp_level: jax.Array,
                  kp_response: jax.Array, map_idx: jax.Array,
                  new_valid: jax.Array) -> FrameState:
    """Masked insertion of aligned features into free slots
    (Frame::AddKey, Frame.cpp:139-163, used by the direct matcher's
    FeaturesAlign at matcher.cpp:1610-1617).

    Free slots are assigned to new entries by prefix-sum compaction; overflow
    beyond capacity is dropped (the reference grows a std::vector — a fixed
    capacity with drop-on-overflow is the static-shape equivalent).
    """
    cap = frame.capacity
    free = ~frame.valid  # (cap,)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    new_rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1  # rank of each new kp
    n_free = jnp.sum(free)
    # slot for new keypoint of rank r = index of r-th free slot
    slot_of_rank = jnp.full((cap,), cap, jnp.int32)
    slot_idx = jnp.arange(cap, dtype=jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free, free_rank, cap)].set(
        jnp.where(free, slot_idx, cap), mode="drop")
    take = new_valid & (new_rank < n_free)
    dest = jnp.where(take, slot_of_rank[jnp.clip(new_rank, 0, cap - 1)], cap)

    bearing = cam_mod.cam2world(cam, kp_xy)

    # out-of-range dest (== cap) rows are dropped by the scatter, so
    # non-taken entries never land anywhere
    def scat(arr, vals):
        return arr.at[dest].set(vals, mode="drop")

    return frame._replace(
        kp_xy=scat(frame.kp_xy, kp_xy),
        kp_level=frame.kp_level.at[dest].set(kp_level, mode="drop"),
        kp_angle=frame.kp_angle.at[dest].set(jnp.zeros_like(kp_response), mode="drop"),
        kp_response=frame.kp_response.at[dest].set(kp_response, mode="drop"),
        bearing=scat(frame.bearing, bearing),
        map_idx=frame.map_idx.at[dest].set(map_idx, mode="drop"),
        valid=frame.valid.at[dest].set(True, mode="drop"),
    )


def is_in_frustum(frame: FrameState, cam: cam_mod.CameraParams,
                  points_w: jax.Array, normals: jax.Array,
                  min_dist: jax.Array, max_dist: jax.Array,
                  view_cos_limit: float = 0.5):
    """Batched Frame::IsInFrustum (Frame.cpp:370-412): project into the frame,
    gate on image bounds, distance band [0.8*min, 1.2*max], and viewing angle
    vs landmark normal. Returns (px (M, 2), depth (M,), ok (M,), view_cos (M,))."""
    pc = se3.transform_points(frame.T_cw, points_w)
    px = cam_mod.world2cam(cam, pc)
    depth = pc[..., 2]
    inb = cam_mod.is_in_frame(cam, px)
    cam_center = se3.inverse(frame.T_cw)[:3, 3]
    po = points_w - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)
    view_cos = jnp.sum(po * normals, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (depth > 0) & inb & dist_ok & (view_cos > view_cos_limit)
    return px, depth, ok, view_cos
