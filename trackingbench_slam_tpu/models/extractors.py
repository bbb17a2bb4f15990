"""Feature extractors: ORB-style and FAST/Shi-Tomasi (SVO-style).

Replaces ORBExtractor (src/extractors/ORBextractor.cpp:906-978) and
FASTExtractor (src/extractors/FASTextractor.cpp:8-80). Both are pure
functions FrameState -> FrameState built from the ops/ kernels; the two
differ exactly as in the reference:

  * `extract_orb`  — multi-level FAST + spatial distribution + IC-angle
    orientation + rotated-BRIEF descriptors on blurred levels.
  * `extract_fast` — single-or-multi-level FAST ranked by Shi-Tomasi score,
    one winner per occupancy cell, no descriptors (direct tracking needs
    patches, not descriptors).

Design deltas from the reference, by intent:
  * Per-level feature budget follows the same geometric split over scales
    (ORBextractor.cpp:919-930).
  * The two-threshold fallback (cell retried with threshold 30 when 80 finds
    nothing, ORBextractor.cpp:765-804) runs as two static detection passes:
    the min_threshold score map supplies candidates, the init_threshold
    detection mask gates weak corners out of cells that hold a strong one
    (fast_ops.grid_topk's `strong` argument) — same semantics, no
    data-dependent second pass.
  * DistributeOctTree's sequential quad-tree (ORBextractor.cpp:494-733) is
    replaced by per-cell top-k (the FASTextractor grid strategy,
    FASTextractor.cpp:18-25) — static shapes, same uniformity goal.
  * `AddPoints` (re-detect while suppressing cells near existing keypoints,
    ORBextractor.cpp:840-904 / FASTextractor.cpp:129-150) is the same
    detection with an occupancy mask multiplied into the score map.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.models.frame import FrameState, with_keypoints
from trackingbench_slam_tpu.ops import fast as fast_ops
from trackingbench_slam_tpu.ops import image as image_ops
from trackingbench_slam_tpu.ops import orb as orb_ops
from trackingbench_slam_tpu.ops.pallas.fast_kernel import fast_score_map_pallas
from trackingbench_slam_tpu.ops.pallas.patch_kernel import (
    brief_from_patches, extract_patches32, ic_angle_from_patches)
from trackingbench_slam_tpu.utils.config import ExtractorConfig, PyramidConfig


def detect_scores(img, threshold: float, arc: int):
    """NMS'd FAST score map; fused Pallas kernel on TPU, XLA compose
    elsewhere."""
    if jax.default_backend() == "tpu":
        return fast_score_map_pallas(img, threshold, arc)
    return fast_ops.nms3x3(fast_ops.fast_score_map(img, threshold, arc))


def level_budgets(total: int, num_levels: int, scale: float) -> list[int]:
    """Geometric per-level split, sum == total (ORBextractor.cpp:919-930:
    nfeatures * (1-f)/(1-f^L) * f^level with remainder to the last level)."""
    inv = scale  # features per level proportional to level area factor
    factor = inv
    weights = [factor ** l for l in range(num_levels)]
    s = sum(weights)
    out = [int(round(total * w / s)) for w in weights]
    out[0] += total - sum(out)
    return out


def occupancy_mask(shape_hw: tuple[int, int], existing_xy: jax.Array,
                   existing_valid: jax.Array, radius: int) -> jax.Array:
    """(H, W) float mask, 0 inside `radius` (Chebyshev) of any existing
    keypoint. Implements the exit-keypoint suppression of AddPoints
    (ORBextractor.cpp:717-729: reject within 20 px; FASTextractor.cpp:133-141:
    mark grid cells occupied)."""
    h, w = shape_hw
    xi = jnp.clip(jnp.round(existing_xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(existing_xy[:, 1]).astype(jnp.int32), 0, h - 1)
    # presence image as ONE MXU matmul instead of an N-row scatter (the
    # .at[yi, xi].max scatter serializes at ~1.8 ms/2000 rows on TPU, and
    # this runs once per pyramid level): occ[y, x] > 0 iff some valid
    # point rounds to (y, x)
    yi = jnp.where(existing_valid, yi, h)  # one_hot(h) of an OOB row = 0
    Y = jax.nn.one_hot(yi, h, dtype=jnp.float32)        # (N, h)
    X = jax.nn.one_hot(xi, w, dtype=jnp.float32)        # (N, w)
    occ = jax.lax.dot_general(Y, X, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (h, w)
    occ = (occ > 0.0).astype(jnp.float32)
    k = 2 * radius + 1
    # Chebyshev dilation, separable (max filter factorizes exactly)
    occ = jax.lax.reduce_window(occ, 0.0, jax.lax.max, (1, k), (1, 1), "SAME")
    occ = jax.lax.reduce_window(occ, 0.0, jax.lax.max, (k, 1), (1, 1), "SAME")
    return 1.0 - occ


@functools.partial(jax.jit, static_argnames=("config", "pyr_cfg"))
def extract_orb(frame: FrameState, cam: cam_mod.CameraParams,
                config: ExtractorConfig, pyr_cfg: PyramidConfig,
                suppress_xy: jax.Array | None = None,
                suppress_valid: jax.Array | None = None) -> FrameState:
    """Full ORB extraction pass over the frame's pyramid.

    Returns the frame with keypoint arrays filled (capacity = config.num_features,
    invalid tail masked). When suppress_xy/valid are given, behaves like
    AddPoints: cells already containing live features produce nothing.
    """
    num_levels = len(frame.pyramid)
    budgets = level_budgets(config.num_features, num_levels, pyr_cfg.scale_factor)
    all_xy, all_resp, all_valid, all_level, all_angle, all_desc = [], [], [], [], [], []
    for lvl in range(num_levels):
        img = frame.pyramid[lvl]
        s = pyr_cfg.scale_factor ** lvl
        score = detect_scores(img, float(config.min_threshold),
                              config.fast_arc)
        # two-threshold fallback (ORBextractor.cpp:765-804): corners that
        # survive detection at init_threshold gate out the weak ones in
        # their cell; cells with none keep their min_threshold corners
        strong = None
        if config.init_threshold > config.min_threshold:
            strong = detect_scores(img, float(config.init_threshold),
                                   config.fast_arc) > 0
        if suppress_xy is not None:
            m = occupancy_mask(img.shape, suppress_xy * s, suppress_valid,
                               max(int(10 * s), 2))
            score = score * m
        cell = max(int(config.cell_size * s), 8)
        xy, resp, valid = fast_ops.grid_topk(score, cell, per_cell=4,
                                             budget=budgets[lvl],
                                             strong=strong)
        # 7x7 descriptor blur (ORBextractor.cpp:884,960) computed here on
        # demand: only keyframes run extraction, so tracking frames never
        # pay for it (make_frame does not blur)
        blurred = image_ops.gaussian_blur(img)
        if jax.default_backend() == "tpu":
            # gather-free path: window-DMA patches + one-matmul rBRIEF.
            # The IC angle MUST come from the pre-blur patches (as the
            # reference computes it, ORBextractor.cpp:960): computing it
            # from the blurred patches to save the second window-DMA pass
            # looked harmless (descriptors only match descriptors built the
            # same way) but on smooth renders the blur collapses the 31-px
            # intensity centroid toward zero, angles go noise-dominated,
            # and the resulting descriptor noise poisons projection-map
            # FUSION during post-loss re-mapping — measured on the loop
            # bench: the closer-less arm never re-acquired after its
            # low-texture stretch (closing err 1.6e8 m vs 0.78 m with
            # pre-blur angles; benchmarks/loop_noclose_diag.py).
            patches = extract_patches32(img, xy, valid)
            angle = jnp.where(valid, ic_angle_from_patches(patches), 0.0)
            bpatches = extract_patches32(blurred, xy, valid)
            desc = brief_from_patches(bpatches, angle, valid)
        else:
            angle = orb_ops.ic_angle(img, xy, valid)
            desc = orb_ops.brief_descriptors(blurred, xy, angle, valid)
        all_xy.append(xy / s)  # rescale to level-0 coords (ORBextractor.cpp:968-974)
        all_resp.append(resp)
        all_valid.append(valid)
        all_level.append(jnp.full((budgets[lvl],), lvl, jnp.int32))
        all_angle.append(angle)
        all_desc.append(desc)
    kp_xy = jnp.concatenate(all_xy)
    resp = jnp.concatenate(all_resp)
    valid = jnp.concatenate(all_valid)
    level = jnp.concatenate(all_level)
    angle = jnp.concatenate(all_angle)
    desc = jnp.concatenate(all_desc)
    cap = frame.capacity
    n = kp_xy.shape[0]
    if n < cap:
        pad = cap - n
        kp_xy = jnp.pad(kp_xy, ((0, pad), (0, 0)), constant_values=-1.0)
        resp = jnp.pad(resp, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        level = jnp.pad(level, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
    elif n > cap:
        # keep strongest
        order = jnp.argsort(jnp.where(valid, -resp, 1e9))[:cap]
        kp_xy, resp, valid = kp_xy[order], resp[order], valid[order]
        level, angle, desc = level[order], angle[order], desc[order]
    return with_keypoints(frame, cam, kp_xy, level, angle, resp, desc, valid)


@functools.partial(jax.jit, static_argnames=("config", "pyr_cfg", "num_levels"))
def extract_fast(frame: FrameState, cam: cam_mod.CameraParams,
                 config: ExtractorConfig, pyr_cfg: PyramidConfig,
                 num_levels: int = 3,
                 suppress_xy: jax.Array | None = None,
                 suppress_valid: jax.Array | None = None) -> FrameState:
    """SVO-style detection (FASTextractor.cpp:8-80): FAST corners scored by
    Shi-Tomasi, one winner per grid cell across the first `num_levels` levels;
    no descriptors (desc left zero)."""
    budgets = level_budgets(config.num_features, num_levels, pyr_cfg.scale_factor)
    all_xy, all_resp, all_valid, all_level = [], [], [], []
    for lvl in range(num_levels):
        img = frame.pyramid[lvl]
        s = pyr_cfg.scale_factor ** lvl
        score = detect_scores(img, float(config.min_threshold),
                              config.fast_arc)
        st = fast_ops.shi_tomasi_map(img)
        score = jnp.where(score > 0, st, 0.0)
        if suppress_xy is not None:
            m = occupancy_mask(img.shape, suppress_xy * s, suppress_valid,
                               max(int(config.cell_size * s) // 2, 2))
            score = score * m
        cell = max(int(config.cell_size * s), 8)
        xy, resp, valid = fast_ops.grid_topk(score, cell, per_cell=1,
                                             budget=budgets[lvl])
        all_xy.append(xy / s)
        all_resp.append(resp)
        all_valid.append(valid)
        all_level.append(jnp.full((budgets[lvl],), lvl, jnp.int32))
    kp_xy = jnp.concatenate(all_xy)
    resp = jnp.concatenate(all_resp)
    valid = jnp.concatenate(all_valid)
    level = jnp.concatenate(all_level)
    cap = frame.capacity
    n = kp_xy.shape[0]
    if n < cap:
        pad = cap - n
        kp_xy = jnp.pad(kp_xy, ((0, pad), (0, 0)), constant_values=-1.0)
        resp = jnp.pad(resp, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        level = jnp.pad(level, (0, pad))
    angle = jnp.zeros((cap,), frame.kp_angle.dtype)
    desc = jnp.zeros((cap, 8), jnp.uint32)
    return with_keypoints(frame, cam, kp_xy[:cap], level[:cap], angle,
                          resp[:cap], desc, valid[:cap])
