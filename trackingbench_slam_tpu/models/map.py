"""MapState / KeyframeStore — fixed-capacity functional map.

Replaces the reference's pointer-graph map layer:
  * Map (src/types/Map.cpp): std::set of Frame* and MapPoint* with three
    mutexes -> two fixed-capacity slot tables with validity masks. Erase is a
    mask flip; RemoveOldFrames (Map.cpp:103-114) is a ring-buffer eviction.
  * MapPoint (src/types/MapPoint.cpp): per-landmark world position,
    observation list (Frame* -> feature index), viewing normal and
    scale-invariance distance band, representative descriptor, visible/found
    counters -> columns of MapState.

All mutation is functional scatter/mask arithmetic, so map updates can live
inside jit and shard across devices (landmark axis). Slot allocation uses the
same prefix-sum free-slot compaction as FrameState.add_keypoints. No mutexes
exist because no state is shared mutably (the reference's
mMutexMap/mMutexFeatures/mGlobalMutex protect exactly what immutability
removes).

Citations into the reference for behavior parity:
  * AddObservation / EraseObservation    <- MapPoint.cpp:94-122
  * SetBadFlag / Replace                 <- MapPoint.cpp:139-198
  * ComputeDistinctiveDescriptors        <- MapPoint.cpp:253-318
  * UpdateNormalAndDepth                 <- MapPoint.cpp:320-361
  * GetCloseViewObs                      <- MapPoint.cpp:373-393
  * PredictScale                         <- MapPoint.cpp:219-233
  * IncreaseVisible/Found + GetFoundRatio <- MapPoint.h:62-66 counters used
    by the direct matcher's candidate eviction (matcher.cpp:1044-1051)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.ops import hamming
from trackingbench_slam_tpu.ops import packing


class MapState(NamedTuple):
    pos: jax.Array        # (M, 3) world positions
    desc: jax.Array       # (M, 8) representative descriptor (uint32 words)
    normal: jax.Array     # (M, 3) mean viewing direction
    min_dist: jax.Array   # (M,) scale-invariance band
    max_dist: jax.Array   # (M,)
    valid: jax.Array      # (M,) slot alive
    ref_kf: jax.Array     # (M,) keyframe slot that created the point
    ref_level: jax.Array  # (M,) pyramid level of the creating observation
    n_visible: jax.Array  # (M,) times predicted visible
    n_found: jax.Array    # (M,) times actually matched
    n_fail_reproj: jax.Array  # (M,) direct-matcher failure counter
    obs_kf: jax.Array     # (M, K) observing keyframe slots, -1 empty
    obs_feat: jax.Array   # (M, K) feature index within that keyframe
    obs_desc: jax.Array   # (M, K, 8) descriptor captured at observation
    #                       time (uint32 words). Keyframe descriptors are
    #                       write-once snapshots, so storing them per
    #                       landmark at add_observations time (a <=2048-row
    #                       scatter) is exact — and it makes
    #                       compute_distinctive_descriptors gather-free:
    #                       the (M*K)-row two-level gather from
    #                       kfs.desc[obs_kf, obs_feat] serialized at
    #                       several ms per keyframe on TPU (bisect_keyframe2
    #                       'full' delta).
    obs_count: jax.Array  # (M,)
    # Anchor-patch atlas: one ATLAS_CELL x ATLAS_CELL image patch per
    # landmark slot, captured around the creating observation, packed into
    # ONE big image so the Pallas LK kernel can align current-frame
    # features against their creation-time appearance (the role of the
    # reference's warped reference patch in FindMatchDirect,
    # matcher.cpp:1552-1602). Keyframe observations re-aligned against
    # these anchors carry no accumulated frame-to-frame LK drift — without
    # this, windowed BA consolidates the drift into the map (measured:
    # full-ring BA on drifted obs made keyframe ATE worse than motion-only
    # tracking; with consistent obs the solver is exact to < 1e-5,
    # tools/diag_ba_gap.py --gt-obs).
    anchor_atlas: jax.Array  # (G*CELL, G*CELL) f32, G = ceil(sqrt(M))

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)

    @property
    def atlas_grid(self) -> int:
        return self.anchor_atlas.shape[0] // ATLAS_CELL


ATLAS_CELL = 16  # px per atlas cell; anchor alignment uses half <= 5


def atlas_grid_for(capacity: int) -> int:
    g = 1
    while g * g < capacity:
        g += 1
    return g


def atlas_cell_centers(slots: jax.Array, grid: int) -> jax.Array:
    """(B,) landmark slots -> (B, 2) atlas (x, y) cell-center positions."""
    row = slots // grid
    col = slots % grid
    c = ATLAS_CELL
    return jnp.stack([col * c + c // 2, row * c + c // 2],
                     axis=-1).astype(jnp.float32)


def bilinear_cell_patches_pallas(img: jax.Array, kp_xy: jax.Array,
                                 ok: jax.Array, interpret: bool = False):
    """(B, c, c) bilinear patches centered on kp_xy, gather-free.

    The 4-tap bilinear gather of (B, c, c) patches (B*c*c*4 ~ 650k image
    gathers at B=2000) serialized at ~22 ms per keyframe inside the fused
    keyframe program (bisect_keyframe2 'atlas' delta) — the single largest
    keyframe substage. The Pallas window-DMA extractor cuts an
    integer-aligned neighborhood per point; the sub-pixel offset becomes a
    4-tap blend of STATIC slices (sample positions kp+off for integer off
    share one fractional part, so one (fx, fy) per point is exact).
    Points must be >= c//2+1 px from the border (extraction guarantees
    this for real keypoints; masked rows are arbitrary)."""
    from trackingbench_slam_tpu.ops.pallas.patch_kernel import (
        extract_patches32)
    c = ATLAS_CELL
    x0 = jnp.floor(kp_xy[:, 0])
    y0 = jnp.floor(kp_xy[:, 1])
    # extract_patches32 cuts at round(center)-15; center = floor(kp) +
    # (15 - c//2) (integers, so round is exact) puts the tap origin
    # floor(kp)-(c//2) at patch-local (0, 0)
    off = float(15 - c // 2)
    centers = jnp.stack([x0 + off, y0 + off], axis=-1)
    pat = extract_patches32(img, centers, ok, interpret=interpret)
    fx = (kp_xy[:, 0] - x0)[:, None, None]
    fy = (kp_xy[:, 1] - y0)[:, None, None]
    block = pat[:, :c + 1, :c + 1]
    t00 = block[:, :c, :c]
    t01 = block[:, :c, 1:]
    t10 = block[:, 1:, :c]
    t11 = block[:, 1:, 1:]
    return ((1 - fy) * ((1 - fx) * t00 + fx * t01)
            + fy * ((1 - fx) * t10 + fx * t11))          # (B, c, c)


def write_anchor_patches(m: MapState, img: jax.Array, kp_xy: jax.Array,
                         slots: jax.Array, want: jax.Array) -> MapState:
    """Capture ATLAS_CELL^2 patches around kp_xy (bilinear, so the cell
    center lands EXACTLY on the feature position) and write them into the
    atlas cells of `slots`. Call right after add_points with its returned
    slots; want masks rows (dropped rows write nowhere).

    The write is a one-hot MXU matmul + masked blend, not a scatter: the
    elementwise (B, c, c)-cell scatter into the (g*c, g*c) atlas serialized
    on TPU at ~300 ms per keyframe (measured, benchmarks/bisect_writers.py)
    — the single largest cost in the whole keyframe step. slots are unique
    (add_points allocates distinct free slots), so sum-of-one-hots equals
    the scattered value."""
    c = ATLAS_CELL
    g = m.atlas_grid
    h, w = img.shape
    slot_ok0 = want & (slots >= 0) & (slots < m.capacity)
    if jax.default_backend() == "tpu":
        patches = bilinear_cell_patches_pallas(img, kp_xy, slot_ok0)
    else:
        offs = jnp.arange(c, dtype=img.dtype) - (c // 2)
        oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
        sx = kp_xy[:, 0, None, None] + ox[None]
        sy = kp_xy[:, 1, None, None] + oy[None]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
        v00 = img[y0i, x0i]
        v01 = img[y0i, x0i + 1]
        v10 = img[y0i + 1, x0i]
        v11 = img[y0i + 1, x0i + 1]
        patches = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
                   + fy * ((1 - fx) * v10 + fx * v11))   # (B, c, c)
    B = patches.shape[0]
    G2 = g * g
    slot_ok = want & (slots >= 0) & (slots < m.capacity)
    s = jnp.where(slot_ok, slots, G2)
    onehot = jax.nn.one_hot(s, G2, dtype=patches.dtype)     # (B, G2)
    # (G2, c*c) = onehot^T @ patches — pixel values compared by the
    # anchored aligner, so keep full f32 (bf16 MXU rounding shifts the
    # photometric template by up to ~1 intensity LSB)
    new_cells = jax.lax.dot_general(
        onehot, patches.reshape(B, c * c), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)                # (G2, c*c)
    written = jnp.sum(onehot, axis=0) > 0                   # (G2,)
    cur = m.anchor_atlas.reshape(g, c, g, c).transpose(0, 2, 1, 3
                                                       ).reshape(G2, c * c)
    out = jnp.where(written[:, None], new_cells, cur)
    atlas = out.reshape(g, g, c, c).transpose(0, 2, 1, 3).reshape(g * c,
                                                                  g * c)
    return m._replace(anchor_atlas=atlas)


class KeyframeStore(NamedTuple):
    """Ring buffer of keyframe feature snapshots (poses + feature arrays).

    The pyramid images of keyframes are NOT stored here (device memory);
    the host pipeline keeps the most recent keyframe's pyramid for direct
    matching, mirroring how the reference only ever aligns against recent
    covisible keyframes (matcher.cpp:991-1005)."""

    T_cw: jax.Array      # (KF, 4, 4)
    kp_xy: jax.Array     # (KF, N, 2)
    kp_level: jax.Array  # (KF, N)
    kp_angle: jax.Array  # (KF, N)
    desc: jax.Array      # (KF, N, 8)
    bearing: jax.Array   # (KF, N, 3)
    map_idx: jax.Array   # (KF, N)
    kp_valid: jax.Array  # (KF, N)
    valid: jax.Array     # (KF,)
    frame_id: jax.Array  # (KF,) global frame number (for ring eviction)
    kp_ur: jax.Array     # (KF, N) rectified right-image u per feature
    #                      (-1 = no stereo match); feeds the stereo rows of
    #                      windowed BA (ORB-SLAM2-style u_R observations)


def empty_map(capacity: int, max_obs: int, dtype=jnp.float32) -> MapState:
    M, K = capacity, max_obs
    A = atlas_grid_for(M) * ATLAS_CELL
    return MapState(
        anchor_atlas=jnp.zeros((A, A), dtype),
        pos=jnp.zeros((M, 3), dtype),
        desc=jnp.zeros((M, 8), jnp.uint32),
        normal=jnp.zeros((M, 3), dtype),
        min_dist=jnp.zeros((M,), dtype),
        max_dist=jnp.full((M,), 1e9, dtype),
        valid=jnp.zeros((M,), bool),
        ref_kf=jnp.full((M,), -1, jnp.int32),
        ref_level=jnp.zeros((M,), jnp.int32),
        n_visible=jnp.ones((M,), jnp.int32),
        n_found=jnp.ones((M,), jnp.int32),
        n_fail_reproj=jnp.zeros((M,), jnp.int32),
        obs_kf=jnp.full((M, K), -1, jnp.int32),
        obs_feat=jnp.full((M, K), -1, jnp.int32),
        obs_desc=jnp.zeros((M, K, 8), jnp.uint32),
        obs_count=jnp.zeros((M,), jnp.int32),
    )


def empty_keyframes(max_kf: int, kp_capacity: int, dtype=jnp.float32) -> KeyframeStore:
    KF, N = max_kf, kp_capacity
    return KeyframeStore(
        T_cw=jnp.tile(jnp.eye(4, dtype=dtype), (KF, 1, 1)),
        kp_xy=jnp.full((KF, N, 2), -1.0, dtype),
        kp_level=jnp.zeros((KF, N), jnp.int32),
        kp_angle=jnp.zeros((KF, N), dtype),
        desc=jnp.zeros((KF, N, 8), jnp.uint32),
        bearing=jnp.zeros((KF, N, 3), dtype),
        map_idx=jnp.full((KF, N), -1, jnp.int32),
        kp_valid=jnp.zeros((KF, N), bool),
        valid=jnp.zeros((KF,), bool),
        frame_id=jnp.full((KF,), -1, jnp.int32),
        kp_ur=jnp.full((KF, N), -1.0, dtype),
    )


def free_slot_destinations(free: jax.Array, want: jax.Array) -> jax.Array:
    """Assign the r-th wanted item to the r-th free slot; items beyond the
    free count get destination == capacity (to be dropped by scatter).
    (Two alternative gather/scatter-free formulations — a stable argsort
    rank table with a one-hot matmul lookup, and a cumsum broadcast
    compare-reduce — both measured SLOWER in-context on TPU than this
    scatter+gather pair as fused by XLA inside add_points: 0.99/3.84 ms vs
    0.40 ms, bisect_insert runs r5.)"""
    cap = free.shape[0]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_idx = jnp.arange(cap, dtype=jnp.int32)
    slot_of_rank = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)].set(
        jnp.where(free, slot_idx, cap), mode="drop")
    want_rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    n_free = jnp.sum(free)
    take = want & (want_rank < n_free)
    return jnp.where(take, slot_of_rank[jnp.clip(want_rank, 0, cap - 1)], cap)


def add_points(m: MapState, pos: jax.Array, desc: jax.Array,
               normal: jax.Array, min_dist: jax.Array, max_dist: jax.Array,
               ref_kf: jax.Array, ref_level: jax.Array,
               want: jax.Array) -> tuple[MapState, jax.Array]:
    """Allocate new landmarks (MapPoint ctor, MapPoint.cpp:13-43 +
    Map::AddMapPoint, Map.cpp:30-36). Returns (new_map, slot (Nnew,) int32
    with capacity-sentinel for dropped/not-wanted entries)."""
    dest = free_slot_destinations(~m.valid, want)
    K = m.obs_kf.shape[1]
    n = pos.shape[0]
    ones = jnp.ones((n,), jnp.int32)
    no_obs = jnp.full((n, K), -1, jnp.int32)
    no_desc = jnp.zeros((n, K * 8), jnp.uint32)
    (pos_, desc_, normal_, min_d, max_d, valid_, ref_kf_, ref_level_,
     n_vis, n_fnd, n_fail, obs_kf_, obs_feat_, obs_desc_,
     obs_count_) = packing.scatter_rows_set(
        [m.pos, m.desc, m.normal, m.min_dist, m.max_dist, m.valid,
         m.ref_kf, m.ref_level, m.n_visible, m.n_found, m.n_fail_reproj,
         m.obs_kf, m.obs_feat, m.obs_desc.reshape(m.capacity, K * 8),
         m.obs_count],
        dest,
        [pos, desc, normal, min_dist, max_dist, jnp.ones((n,), bool),
         ref_kf.astype(jnp.int32), ref_level.astype(jnp.int32),
         ones, ones, ones * 0, no_obs, no_obs, no_desc, ones * 0])
    obs_desc_ = obs_desc_.reshape(m.capacity, K, 8)
    new = m._replace(
        pos=pos_, desc=desc_, normal=normal_, min_dist=min_d,
        max_dist=max_d, valid=valid_, ref_kf=ref_kf_, ref_level=ref_level_,
        n_visible=n_vis, n_found=n_fnd, n_fail_reproj=n_fail,
        obs_kf=obs_kf_, obs_feat=obs_feat_, obs_desc=obs_desc_,
        obs_count=obs_count_)
    return new, dest


def add_observations(m: MapState, point_idx: jax.Array, kf_slot: jax.Array,
                     feat_idx: jax.Array, want: jax.Array,
                     desc: jax.Array | None = None) -> MapState:
    """Append (keyframe, feature) observations to landmarks
    (MapPoint::AddObservation, MapPoint.cpp:94-105). point_idx: (B,) landmark
    slots; kf_slot scalar or (B,); feat_idx: (B,). Ring-overwrites when a
    landmark's observation list is full.

    desc: (B, 8) uint32 descriptors of the observing features (the rows of
    the keyframe's descriptor table the observations point at). Stored in
    the per-landmark obs_desc table so descriptor maintenance never gathers
    from the keyframe store; pass it whenever the caller will rely on
    compute_distinctive_descriptors (omitting it records zero descriptors
    for these observations)."""
    K = m.obs_kf.shape[1]
    cap = m.capacity
    pi = jnp.where(want, point_idx, cap)
    col = jnp.clip(m.obs_count[jnp.clip(pi, 0, cap - 1)] % K, 0, K - 1)
    kf_b = jnp.broadcast_to(jnp.asarray(kf_slot), feat_idx.shape)
    if desc is None:
        desc = jnp.zeros((feat_idx.shape[0], 8), jnp.uint32)
    # ONE packed scatter for the three (pi, col)-addressed tables: three
    # separate 2D scatters serialized at ~3.4 ms per keyframe
    # (bisect_insert); packing into (M*K, 10) uint32 rows makes it one
    # row scatter + cheap reshapes (same trick as ops/packing)
    flat = jnp.where(want, pi * K + col, cap * K)
    tab = jnp.concatenate([
        jax.lax.bitcast_convert_type(m.obs_kf, jnp.uint32
                                     ).reshape(cap * K, 1),
        jax.lax.bitcast_convert_type(m.obs_feat, jnp.uint32
                                     ).reshape(cap * K, 1),
        m.obs_desc.reshape(cap * K, 8)], axis=1)            # (M*K, 10)
    payload = jnp.concatenate([
        jax.lax.bitcast_convert_type(kf_b.astype(jnp.int32), jnp.uint32
                                     )[:, None],
        jax.lax.bitcast_convert_type(feat_idx.astype(jnp.int32), jnp.uint32
                                     )[:, None],
        desc], axis=1)                                      # (B, 10)
    tab = tab.at[flat].set(payload, mode="drop")
    obs_kf = jax.lax.bitcast_convert_type(tab[:, 0], jnp.int32
                                          ).reshape(cap, K)
    obs_feat = jax.lax.bitcast_convert_type(tab[:, 1], jnp.int32
                                            ).reshape(cap, K)
    obs_desc = tab[:, 2:].reshape(cap, K, 8)
    obs_count = m.obs_count.at[pi].add(jnp.where(want, 1, 0), mode="drop")
    return m._replace(obs_kf=obs_kf, obs_feat=obs_feat, obs_desc=obs_desc,
                      obs_count=obs_count)


def erase_points(m: MapState, point_idx: jax.Array, want: jax.Array) -> MapState:
    """SetBadFlag (MapPoint.cpp:139-160): a mask flip."""
    cap = m.capacity
    pi = jnp.where(want, point_idx, cap)
    return m._replace(valid=m.valid.at[pi].set(False, mode="drop"))


def replace_points(m: MapState, old_idx: jax.Array, new_idx: jax.Array,
                   want: jax.Array) -> tuple[MapState, jax.Array]:
    """MapPoint::Replace (MapPoint.cpp:162-198): fuse duplicate landmarks —
    the old point dies, its found/visible statistics merge into the new one,
    and a redirect table is returned so frames/keyframes can rewrite their
    map_idx links (the reference walks Frame::ReplaceMapPointMatch; here the
    caller applies `redirect[map_idx]` as one gather).

    Returns (map, redirect (capacity+1,) int32) with redirect[i] = i for
    untouched slots."""
    cap = m.capacity
    oi = jnp.where(want & (old_idx != new_idx), old_idx, cap)
    ni = jnp.clip(new_idx, 0, cap - 1)
    nvis = m.n_visible.at[jnp.where(oi < cap, ni, cap)].add(
        m.n_visible[jnp.clip(oi, 0, cap - 1)], mode="drop")
    nfnd = m.n_found.at[jnp.where(oi < cap, ni, cap)].add(
        m.n_found[jnp.clip(oi, 0, cap - 1)], mode="drop")
    valid = m.valid.at[oi].set(False, mode="drop")
    redirect = jnp.arange(cap + 1, dtype=jnp.int32)
    redirect = redirect.at[oi].set(ni.astype(jnp.int32), mode="drop")
    return m._replace(valid=valid, n_visible=nvis, n_found=nfnd), redirect


def increase_visible(m: MapState, point_idx: jax.Array, want: jax.Array) -> MapState:
    cap = m.capacity
    pi = jnp.where(want, point_idx, cap)
    return m._replace(n_visible=m.n_visible.at[pi].add(1, mode="drop"))


def increase_found(m: MapState, point_idx: jax.Array, want: jax.Array) -> MapState:
    cap = m.capacity
    pi = jnp.where(want, point_idx, cap)
    return m._replace(n_found=m.n_found.at[pi].add(1, mode="drop"))


def add_reproj_failures(m: MapState, point_idx: jax.Array, failed: jax.Array,
                        evict_after: int = 30) -> MapState:
    """Direct-matcher failure counting + eviction of chronically failing
    candidates (matcher.cpp:1044-1051: delete after >30 failed
    reprojections)."""
    cap = m.capacity
    pi = jnp.where(failed, point_idx, cap)
    nf = m.n_fail_reproj.at[pi].add(1, mode="drop")
    return m._replace(n_fail_reproj=nf, valid=m.valid & (nf <= evict_after))


def purge_kf_slot(m: MapState, kf_slot: jax.Array,
                  want: jax.Array) -> MapState:
    """Invalidate every observation referencing a keyframe slot that is
    being evicted/reused (the functional analogue of the reference erasing
    a dead Frame's observations via MapPoint::EraseObservation,
    MapPoint.cpp:107-122 — without this, ring-slot reuse would silently
    re-point old observations at the NEW keyframe's features).

    Points whose ref_kf dies keep their scale band but drop the ref link
    (ref_kf = -1), which update_normal_and_depth treats as 'keep current
    band'."""
    hit = (m.obs_kf == kf_slot) & want
    obs_kf = jnp.where(hit, -1, m.obs_kf)
    obs_feat = jnp.where(hit, -1, m.obs_feat)
    ref_dead = (m.ref_kf == kf_slot) & want
    return m._replace(obs_kf=obs_kf, obs_feat=obs_feat,
                      ref_kf=jnp.where(ref_dead, -1, m.ref_kf))


def update_normal_and_depth(m: MapState, kfs: KeyframeStore,
                            scale_factor: float, num_levels: int) -> MapState:
    """Recompute mean viewing normal + scale-invariance distance band from
    the observation lists (MapPoint::UpdateNormalAndDepth,
    MapPoint.cpp:320-361):
      normal   = mean of unit vectors from observing KF centers to the point
      max_dist = dist_to_ref * scale^-level ; min_dist = max_dist * scale^(L-1)
    (with our scale < 1 convention replacing the reference's 1.2 factor).
    Fully batched over landmarks x observation slots.
    """
    Mcap, K = m.obs_kf.shape
    kf_cap = kfs.T_cw.shape[0]
    obs_ok = (m.obs_kf >= 0) & m.valid[:, None]
    # camera centers: T_wc[:3,3] for each observing KF
    T_wc = jax.vmap(se3.inverse)(kfs.T_cw)  # (KF, 4, 4)
    centers = T_wc[:, :3, 3]  # (KF, 3)
    # centers[obs_kf] as a one-hot matmul: the (M*K)-row gather (even from
    # a KF-row table) serializes on TPU; one_hot of a negative slot is all
    # zeros, and those rows are obs_ok-masked anyway
    oh = jax.nn.one_hot(m.obs_kf, kf_cap, dtype=m.pos.dtype)  # (M, K, KF)
    c = jnp.einsum("mkf,fc->mkc", oh, centers,
                   precision=jax.lax.Precision.HIGHEST)  # (M, K, 3)
    d = m.pos[:, None, :] - c
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    dn = jnp.where(obs_ok[..., None], dn, 0.0)
    n_obs = jnp.maximum(jnp.sum(obs_ok, axis=1), 1)
    normal = jnp.sum(dn, axis=1) / n_obs[:, None]
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    oh_ref = jax.nn.one_hot(m.ref_kf, kf_cap, dtype=m.pos.dtype)  # (M, KF)
    ref_center = jnp.einsum("mf,fc->mc", oh_ref, centers,
                            precision=jax.lax.Precision.HIGHEST)
    # ref_kf < 0 -> zero center -> garbage dist, masked by keep_band below
    ref_dist = jnp.linalg.norm(m.pos - ref_center, axis=-1)
    s = jnp.asarray(scale_factor, m.pos.dtype)
    level_scale = jnp.power(s, -m.ref_level.astype(m.pos.dtype))  # >= 1
    max_dist = ref_dist * level_scale
    min_dist = max_dist * (s ** (num_levels - 1))
    has_obs = jnp.any(obs_ok, axis=1)
    keep = m.valid & has_obs
    # scale band needs a live reference keyframe (ref_kf = -1 after eviction
    # keeps the band frozen at its last good value)
    keep_band = keep & (m.ref_kf >= 0)
    return m._replace(
        normal=jnp.where(keep[:, None], normal, m.normal),
        max_dist=jnp.where(keep_band, max_dist, m.max_dist),
        min_dist=jnp.where(keep_band, min_dist, m.min_dist),
    )


def compute_distinctive_descriptors(m: MapState, kfs: KeyframeStore) -> MapState:
    """Representative descriptor = observation whose max... reference takes the
    descriptor minimizing the *median* Hamming distance to all other
    observations (MapPoint::ComputeDistinctiveDescriptors,
    MapPoint.cpp:253-318). Batched: the K observed descriptors per landmark
    come straight from the obs_desc table (recorded at add_observations
    time — keyframe descriptors are write-once, so the copy is exact; the
    former kfs.desc[obs_kf, obs_feat] two-level gather serialized at
    several ms per keyframe on TPU). `kfs` is kept in the signature as the
    conceptual source of the descriptors (and for the CPU oracle tests)."""
    del kfs
    Mcap, K = m.obs_kf.shape
    obs_ok = (m.obs_kf >= 0) & (m.obs_feat >= 0)
    descs = m.obs_desc  # (M, K, 8)
    x = jnp.bitwise_xor(descs[:, :, None, :], descs[:, None, :, :])
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    big = 1e6
    dist = jnp.where(pair_ok, dist, big)
    med = jnp.median(dist, axis=-1)  # (M, K) median distance per candidate row
    med = jnp.where(obs_ok, med, big)
    best = jnp.argmin(med, axis=-1)  # (M,)
    chosen = descs[jnp.arange(Mcap), best]
    has_obs = jnp.any(obs_ok, axis=-1) & m.valid
    return m._replace(desc=jnp.where(has_obs[:, None], chosen, m.desc))


def get_close_view_obs(m: MapState, kfs: KeyframeStore,
                       cam_center_w: jax.Array):
    """For each landmark, the observation with viewing direction closest to
    the current camera's (MapPoint::GetCloseViewObs, MapPoint.cpp:373-393;
    cos > 0.5 gate). Returns (kf_slot (M,), feat_idx (M,), ok (M,))."""
    kf_cap = kfs.T_cw.shape[0]
    kf_idx = jnp.clip(m.obs_kf, 0, kf_cap - 1)
    obs_ok = m.obs_kf >= 0
    T_wc = jax.vmap(se3.inverse)(kfs.T_cw)
    centers = T_wc[:, :3, 3][kf_idx]  # (M, K, 3)
    cur_dir = m.pos - cam_center_w[None, :]
    cur_dir = cur_dir / jnp.maximum(jnp.linalg.norm(cur_dir, axis=-1, keepdims=True), 1e-9)
    obs_dir = m.pos[:, None, :] - centers
    obs_dir = obs_dir / jnp.maximum(jnp.linalg.norm(obs_dir, axis=-1, keepdims=True), 1e-9)
    cos = jnp.sum(obs_dir * cur_dir[:, None, :], axis=-1)
    cos = jnp.where(obs_ok, cos, -2.0)
    best = jnp.argmax(cos, axis=-1)
    ar = jnp.arange(m.capacity)
    best_cos = cos[ar, best]
    ok = (best_cos > 0.5) & m.valid & jnp.any(obs_ok, axis=-1)
    return m.obs_kf[ar, best], m.obs_feat[ar, best], ok


def predict_scale(m: MapState, dist: jax.Array, scale_factor: float,
                  num_levels: int) -> jax.Array:
    """Predict the pyramid level a landmark should appear at, from its
    current distance (MapPoint::PredictScale, MapPoint.cpp:219-233:
    level = ceil(log(max_dist / dist) / log(scaleFactor_ref)); our factor is
    1/scale_factor since our scale < 1)."""
    ratio = jnp.maximum(m.max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    inv = 1.0 / scale_factor
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(inv)).astype(jnp.int32)
    return jnp.clip(lvl, 0, num_levels - 1)


def next_kf_slot(kfs: KeyframeStore) -> jax.Array:
    """Ring policy: first free slot, else evict the oldest frame_id
    (Map::RemoveOldFrames, Map.cpp:103-114)."""
    free = ~kfs.valid
    any_free = jnp.any(free)
    first_free = jnp.argmax(free)
    oldest = jnp.argmin(jnp.where(kfs.valid, kfs.frame_id,
                                  jnp.iinfo(jnp.int32).max))
    return jnp.where(any_free, first_free, oldest)


def insert_keyframe(kfs: KeyframeStore, frame, frame_id,
                    slot: jax.Array | None = None,
                    kp_ur: jax.Array | None = None
                    ) -> tuple[KeyframeStore, jax.Array]:
    """Insert a frame snapshot into the ring (Map::AddKeyFrame, Map.cpp:16-22
    + RemoveOldFrames trim, Map.cpp:103-114). Returns (store, slot).

    kp_ur: (N,) right-image u per feature (stereo pipelines), -1/None for
    mono."""
    if slot is None:
        slot = next_kf_slot(kfs)
    if kp_ur is None:
        kp_ur = jnp.full(frame.kp_level.shape, -1.0, kfs.kp_ur.dtype)
    return kfs._replace(
        T_cw=kfs.T_cw.at[slot].set(frame.T_cw),
        kp_xy=kfs.kp_xy.at[slot].set(frame.kp_xy),
        kp_level=kfs.kp_level.at[slot].set(frame.kp_level),
        kp_angle=kfs.kp_angle.at[slot].set(frame.kp_angle),
        desc=kfs.desc.at[slot].set(frame.desc),
        bearing=kfs.bearing.at[slot].set(frame.bearing),
        map_idx=kfs.map_idx.at[slot].set(frame.map_idx),
        kp_valid=kfs.kp_valid.at[slot].set(frame.valid),
        valid=kfs.valid.at[slot].set(True),
        frame_id=kfs.frame_id.at[slot].set(frame_id),
        kp_ur=kfs.kp_ur.at[slot].set(kp_ur),
    ), slot
