"""Distributed windowed bundle adjustment over a device mesh.

The multi-chip design (SURVEY.md §7 step 8, scaling-book recipe):

  * Landmarks are sharded over the mesh axis 'lm'; every observation lives
    with its landmark's shard (host-side partitioner below).
  * Window poses (K of them) are replicated — they are tiny.
  * Each device builds its local BA blocks (solvers/local_ba.build_ba_blocks
    on its shard): U_d, bp_d are partial sums over local observations; V, W,
    bl are block-diagonal over landmarks and stay fully local.
  * The Schur-reduced camera system S = U - W V^-1 W^T and its rhs are formed
    as one `psum` over 'lm' (the distributed version of the mutex-guarded
    Hessian accumulation in the reference's only parallel loop,
    test/test_projection.cpp:281-287).
  * Every device redundantly Cholesky-solves the replicated (6K, 6K) system
    (cheaper than sharding a 60x60 solve), then back-substitutes ONLY its own
    landmark shard — so landmark updates never cross the interconnect.

Communication per LM iteration: one psum of (6K)^2 + 6K floats ≈ 15 KB at
K=10 — ICI-bound latency, not bandwidth; scaling efficiency is limited only
by the (tiny) replicated solve. The same shard_map program runs on 1 device
(mesh of 1) with zero code change.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from trackingbench_slam_tpu.geometry import camera as cam_mod
from trackingbench_slam_tpu.geometry import se3
from trackingbench_slam_tpu.solvers import local_ba
from trackingbench_slam_tpu.solvers.pose_opt import _huber_rho


class ShardedBAProblem(NamedTuple):
    """Landmark-sharded window. Leading axis of points/obs_* is the global
    (device-major) landmark/observation axis: shard d owns rows
    [d*M_loc : (d+1)*M_loc) and observations [d*O_loc : (d+1)*O_loc) whose
    obs_lm index into the LOCAL shard [0, M_loc)."""

    T_cw: jax.Array        # (K, 4, 4) replicated
    points: jax.Array      # (D*M_loc, 3) sharded over 'lm'
    obs_kf: jax.Array      # (D*O_loc,) global pose ids
    obs_lm: jax.Array      # (D*O_loc,) LOCAL landmark ids
    obs_px: jax.Array      # (D*O_loc, 2)
    obs_inv_sigma2: jax.Array
    obs_valid: jax.Array
    obs_ur: jax.Array      # (D*O_loc,) right-u; -1 = mono row


def partition_problem(p: local_ba.BAProblem, num_shards: int) -> ShardedBAProblem:
    """Host-side partitioner: block-assign landmarks to shards, co-locate and
    re-index their observations, pad every shard to the max count.

    Vectorized: a stable argsort on the shard id groups observations, and a
    per-shard running index places each row — no Python-per-observation loop
    (the r2 version looped over O; at the live 262k-observation scale that
    was seconds of host time per solve)."""
    M = p.points.shape[0]
    O = p.obs_px.shape[0]
    m_loc = -(-M // num_shards)
    obs_lm = np.asarray(p.obs_lm)
    obs_shard = obs_lm // m_loc
    counts = np.bincount(obs_shard, minlength=num_shards)
    o_loc = max(int(counts.max()), 1)
    pts = np.zeros((num_shards * m_loc, 3), np.float32)
    pts[:M] = np.asarray(p.points)
    okf = np.zeros((num_shards, o_loc), np.int32)
    olm = np.zeros((num_shards, o_loc), np.int32)
    opx = np.zeros((num_shards, o_loc, 2), np.float32)
    ois = np.zeros((num_shards, o_loc), np.float32)
    ova = np.zeros((num_shards, o_loc), bool)
    our = np.full((num_shards, o_loc), -1.0, np.float32)
    order = np.argsort(obs_shard, kind="stable")        # group by shard
    srt = obs_shard[order]
    # position within the shard = rank within its group
    starts = np.zeros(num_shards, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    pos = np.arange(O, dtype=np.int64) - starts[srt]
    okf[srt, pos] = np.asarray(p.obs_kf)[order]
    olm[srt, pos] = obs_lm[order] - srt * m_loc
    opx[srt, pos] = np.asarray(p.obs_px)[order]
    ois[srt, pos] = np.asarray(p.obs_inv_sigma2)[order]
    ova[srt, pos] = np.asarray(p.obs_valid)[order]
    if p.obs_ur is not None:
        our[srt, pos] = np.asarray(p.obs_ur)[order]
    return ShardedBAProblem(
        T_cw=p.T_cw,
        points=jnp.asarray(pts),
        obs_kf=jnp.asarray(okf.reshape(-1)),
        obs_lm=jnp.asarray(olm.reshape(-1)),
        obs_px=jnp.asarray(opx.reshape(-1, 2)),
        obs_inv_sigma2=jnp.asarray(ois.reshape(-1)),
        obs_valid=jnp.asarray(ova.reshape(-1)),
        obs_ur=jnp.asarray(our.reshape(-1)),
    )


def distributed_bundle_adjust(mesh: Mesh, cam: cam_mod.CameraParams,
                              sp: ShardedBAProblem,
                              iters: int = 10,
                              huber_delta: float | None = 2.4477,
                              init_lambda: float = 1e-4,
                              num_fixed: int = 1,
                              stereo_weight: float = 1.0):
    """Returns (T_cw (K,4,4), points (D*M_loc,3)). jit-compatible."""
    # coerce to python floats: the lru_cache below hashes these, and a
    # jax/numpy scalar (accepted before the cache existed, when the values
    # were only closed over) is unhashable (ADVICE r4)
    huber_delta = None if huber_delta is None else float(huber_delta)
    fn = _flat_solver(mesh, sp.T_cw.shape[0], int(iters), huber_delta,
                      float(init_lambda), int(num_fixed),
                      float(stereo_weight))
    obs_ur = sp.obs_ur
    if obs_ur is None:  # mono problem: explicit all-mono stereo column
        obs_ur = jnp.full(sp.obs_valid.shape, -1.0, jnp.float32)
    return fn(cam, sp.T_cw, sp.points, sp.obs_kf, sp.obs_lm, sp.obs_px,
              sp.obs_inv_sigma2, sp.obs_valid, obs_ur)


@functools.lru_cache(maxsize=64)
def _flat_solver(mesh: Mesh, K: int, iters: int, huber_delta, init_lambda,
                 num_fixed: int, stereo_weight: float):
    """Build-once jitted shard_map solver. Rebuilding the jit closure per
    call retraced AND recompiled on every eager invocation (~seconds each
    on the dryrun/bench paths); the cache keys on the mesh + static solver
    shape so repeat solves hit the compiled program."""
    lm_axis = "lm"

    def shard_fn(cam, T_cw, points, obs_kf, obs_lm, obs_px, obs_is, obs_va,
                 obs_ur):
        prob = local_ba.BAProblem(
            T_cw=T_cw, points=points, obs_kf=obs_kf, obs_lm=obs_lm,
            obs_px=obs_px, obs_inv_sigma2=obs_is, obs_valid=obs_va,
            obs_ur=obs_ur)

        def total_cost(T, X):
            r, pc, _, _, row_ok = local_ba._obs_residuals(cam, T, X, prob,
                                                          stereo_weight)
            chi2 = local_ba._obs_chi2(r, row_ok, obs_is)
            chi2 = jnp.where(pc[:, 2] <= 0.05, 0.0, chi2)
            rho = chi2 if huber_delta is None else _huber_rho(chi2, huber_delta)
            local = jnp.sum(jnp.where(obs_va, rho, 0.0))
            return jax.lax.psum(local, lm_axis)

        def body(i, state):
            T, X, lam, cost = state
            U, V, Wb, bp, bl, _ = local_ba.build_ba_blocks(
                cam, T, X, prob, huber_delta, stereo_weight)
            # local Schur contributions
            Vinv = local_ba.inv3x3_sym(local_ba.damp_diagonal(V, lam, 3))
            T1 = jnp.einsum("mkij,mjl->mkil", Wb, Vinv,
                            precision=jax.lax.Precision.HIGHEST)
            S_local = -jnp.einsum("maij,mbkj->aibk", T1, Wb,
                                  precision=jax.lax.Precision.HIGHEST)
            S_local = S_local.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
            rhs_local = bp - jnp.einsum("mkij,mj->ki", T1, bl,
                                        precision=jax.lax.Precision.HIGHEST)
            # ONE collective: reduced camera system over ICI
            S = jax.lax.psum(S_local, lm_axis)
            rhs = jax.lax.psum(rhs_local, lm_axis)
            # Marquardt damping on the assembled diagonal (see
            # local_ba.damp_diagonal; the pre-psum U is undamped)
            diagS = S[jnp.arange(K), :, jnp.arange(K), :]
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].set(
                local_ba.damp_diagonal(diagS, lam, 6))
            for f in range(num_fixed):
                S = S.at[f].set(0.0).at[:, :, f, :].set(0.0)
                S = S.at[f, jnp.arange(6), f, jnp.arange(6)].set(1.0)
                rhs = rhs.at[f].set(0.0)
            Sd = S.reshape(6 * K, 6 * K)
            L, low = jax.scipy.linalg.cho_factor(Sd, lower=True)
            dxi = jax.scipy.linalg.cho_solve(
                (L, low), rhs.reshape(-1)).reshape(K, 6)
            # local landmark back-substitution (no communication)
            corr = jnp.einsum("mkij,ki->mj", Wb, dxi,
                              precision=jax.lax.Precision.HIGHEST)
            dX = jnp.einsum("mij,mj->mi", Vinv, bl - corr,
                            precision=jax.lax.Precision.HIGHEST)
            T_new = jax.vmap(lambda d, t: se3.compose(se3.exp(d), t))(dxi, T)
            X_new = X + dX
            c_new = total_cost(T_new, X_new)
            # never accept a non-finite step (NaN positions fall out of the
            # cost mask and would score 0 — see local_ba.bundle_adjust).
            # Shard-local dX finiteness MUST be all-reduced: a NaN confined
            # to one shard does not surface in the psum'd cost, so without
            # the collective, shards would disagree on `accept` and the
            # replicated pose/lambda state would silently diverge.
            bad_local = jnp.any(~jnp.isfinite(dX)).astype(jnp.int32)
            bad = jax.lax.psum(bad_local, lm_axis)
            accept = ((c_new < cost) & jnp.isfinite(c_new)
                      & jnp.all(jnp.isfinite(dxi)) & (bad == 0))
            T = jnp.where(accept, T_new, T)
            X = jnp.where(accept, X_new, X)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 10.0, 1e8))
            cost = jnp.where(accept, c_new, cost)
            return T, X, lam, cost

        T, X, lam, cost = jax.lax.fori_loop(
            0, iters, body,
            (T_cw, points, jnp.asarray(init_lambda, jnp.float32),
             total_cost(T_cw, points)))
        return jax.vmap(se3.normalize)(T), X

    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(lm_axis), P(lm_axis), P(lm_axis), P(lm_axis),
                  P(lm_axis), P(lm_axis), P(lm_axis)),
        out_specs=(P(), P(lm_axis)),
        check_vma=False,
    ))


def distributed_bundle_adjust_grouped(mesh: Mesh, cam: cam_mod.CameraParams,
                                      gp: "local_ba.GroupedBAProblem",
                                      iters: int = 10,
                                      huber_delta: float | None = 2.4477,
                                      init_lambda: float = 1e-4,
                                      num_fixed: int = 1,
                                      fixed_mask: jax.Array | None = None,
                                      stereo_weight: float = 1.0):
    """Distributed GROUPED bundle adjustment — the production (scatter-free)
    formulation sharded over the 'lm' axis.

    The grouped (L, O) layout shards trivially: each device takes an equal
    row block of landmarks WITH their observation rows (no partitioner —
    obs_kf already holds dense window ids, nothing to remap). Per LM
    iteration the only collective is the same single psum of the reduced
    (6K, 6K) camera system + rhs + cost as the flat path; landmark blocks
    never leave their shard. Requires L %% mesh size == 0 (pad with invalid
    rows).

    fixed_mask ((K,) bool, replicated, dynamic) overrides num_fixed —
    clamped poses keep contributing observations, matching
    local_ba.schur_solve.

    Returns (T_cw (K, 4, 4), points (L, 3))."""
    K = gp.T_cw.shape[0]
    if fixed_mask is None:
        fixed_mask = jnp.arange(K) < num_fixed
    # coerce to hashable python scalars for the lru_cache (ADVICE r4)
    huber_delta = None if huber_delta is None else float(huber_delta)
    fn = _grouped_solver(mesh, K, int(iters), huber_delta,
                         float(init_lambda), float(stereo_weight))
    obs_ur = gp.obs_ur
    if obs_ur is None:  # mono problem: explicit all-mono stereo column
        obs_ur = jnp.full(gp.obs_valid.shape, -1.0, jnp.float32)
    return fn(cam, gp.T_cw, gp.points, fixed_mask, gp.obs_kf, gp.obs_px,
              gp.obs_inv_sigma2, gp.obs_valid, obs_ur)


@functools.lru_cache(maxsize=64)
def _grouped_solver(mesh: Mesh, K: int, iters: int, huber_delta,
                    init_lambda, stereo_weight: float):
    """Build-once jitted shard_map solver (see _flat_solver: rebuilding the
    jit closure per call recompiled on every eager invocation)."""
    lm_axis = "lm"

    def shard_fn(cam, T_cw, points, fixm, obs_kf, obs_px, obs_is, obs_va,
                 obs_ur):
        free = 1.0 - fixm.astype(jnp.float32)
        kk = jnp.arange(K)[:, None]
        ii = jnp.arange(6)[None, :]
        prob = local_ba.GroupedBAProblem(
            T_cw=T_cw, points=points, obs_kf=obs_kf, obs_px=obs_px,
            obs_inv_sigma2=obs_is, obs_valid=obs_va, obs_ur=obs_ur)

        def build(T, X):
            """Shard-local blocks + GLOBAL (psum'd) cost at (T, X) — the
            single-sweep LM unit (see local_ba.bundle_adjust_grouped: the
            build at the trial point doubles as the cost evaluation)."""
            U, V, Wb, bp, bl, c_local = local_ba.build_grouped_blocks(
                cam, T, X, prob._replace(T_cw=T, points=X), huber_delta,
                stereo_weight)
            return (U, V, Wb, bp, bl), jax.lax.psum(c_local, lm_axis)

        def body(i, state):
            T, X, lam, cost, blocks = state
            U, V, Wb, bp, bl = blocks
            Vinv = local_ba.inv3x3_sym(local_ba.damp_diagonal(V, lam, 3))
            T1 = jnp.einsum("mkij,mjl->mkil", Wb, Vinv,
                            precision=jax.lax.Precision.HIGHEST)
            S_local = -jnp.einsum("maij,mbkj->aibk", T1, Wb,
                                  precision=jax.lax.Precision.HIGHEST)
            S_local = S_local.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
            rhs_local = bp - jnp.einsum("mkij,mj->ki", T1, bl,
                                        precision=jax.lax.Precision.HIGHEST)
            S = jax.lax.psum(S_local, lm_axis)
            rhs = jax.lax.psum(rhs_local, lm_axis)
            # Marquardt damping on the assembled diagonal (see
            # local_ba.damp_diagonal; the pre-psum U is undamped)
            diagS = S[jnp.arange(K), :, jnp.arange(K), :]
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].set(
                local_ba.damp_diagonal(diagS, lam, 6))
            # dynamic clamp mask (replicated): zero fixed rows/cols,
            # identity diagonal — same scheme as local_ba.schur_solve
            S = S * free[:, None, None, None] * free[None, None, :, None]
            S = S.at[kk, ii, kk, ii].add(fixm.astype(S.dtype)[:, None])
            rhs = rhs * free[:, None]
            Sd = S.reshape(6 * K, 6 * K)
            L, low = jax.scipy.linalg.cho_factor(Sd, lower=True)
            dxi = jax.scipy.linalg.cho_solve(
                (L, low), rhs.reshape(-1)).reshape(K, 6)
            dxi = dxi * free[:, None]
            corr = jnp.einsum("mkij,ki->mj", Wb, dxi,
                              precision=jax.lax.Precision.HIGHEST)
            dX = jnp.einsum("mij,mj->mi", Vinv, bl - corr,
                            precision=jax.lax.Precision.HIGHEST)
            T_new = jax.vmap(lambda d, t: se3.compose(se3.exp(d), t))(dxi, T)
            X_new = X + dX
            blocks_new, c_new = build(T_new, X_new)
            # never accept a non-finite step (NaN positions fall out of the
            # cost mask and would score 0 — see local_ba.bundle_adjust).
            # dX finiteness is all-reduced: shard-local NaNs don't show in
            # the psum'd cost, and a shard-local gate would let `accept`
            # diverge across devices (see the flat path above).
            bad_local = jnp.any(~jnp.isfinite(dX)).astype(jnp.int32)
            bad = jax.lax.psum(bad_local, lm_axis)
            accept = ((c_new < cost) & jnp.isfinite(c_new)
                      & jnp.all(jnp.isfinite(dxi)) & (bad == 0))
            T = jnp.where(accept, T_new, T)
            X = jnp.where(accept, X_new, X)
            blocks = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old),
                blocks_new, blocks)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 10.0, 1e8))
            cost = jnp.where(accept, c_new, cost)
            return T, X, lam, cost, blocks

        blocks0, cost0 = build(T_cw, points)
        T, X, lam, cost, _ = jax.lax.fori_loop(
            0, iters, body,
            (T_cw, points, jnp.asarray(init_lambda, jnp.float32),
             cost0, blocks0))
        return jax.vmap(se3.normalize)(T), X

    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(lm_axis), P(), P(lm_axis), P(lm_axis),
                  P(lm_axis), P(lm_axis), P(lm_axis)),
        out_specs=(P(), P(lm_axis)),
        check_vma=False,
    ))
