"""Pose-graph optimization over the keyframe ring.

The reference has no loop closing, but its BoW layer exists to produce loop
candidates and its g2o dependency is the standard engine for closing them;
pose-graph optimization is the missing piece named in the benchmark configs
(BASELINE.json config 5). TPU-first implementation:

  * Poses: (K, 4, 4) world->camera. Edges: fixed-capacity batch
    (edge_i, edge_j, T_meas_ij = measured T_i T_j^{-1}, info weight, valid).
  * Residual per edge: log(T_meas_ij^{-1} T_i T_j^{-1}) in se(3).
  * Jacobians by vmapped autodiff w.r.t. left-increments on both endpoint
    poses (6x6 each) — idiomatic JAX instead of hand-derived adjoints.
  * GN: scatter block contributions into the dense (6K, 6K) system, clamp
    pose 0, Cholesky, left-multiplicative update. LM damping with
    accept/reject as in the other solvers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from trackingbench_slam_tpu.geometry import se3

HI = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    T_cw: jax.Array      # (K, 4, 4)
    edge_i: jax.Array    # (E,) int32
    edge_j: jax.Array    # (E,) int32
    T_meas: jax.Array    # (E, 4, 4) measured T_i T_j^{-1}
    weight: jax.Array    # (E,) scalar information
    valid: jax.Array     # (E,) bool


def edge_residual(T_i, T_j, T_meas):
    """(6,) se(3) residual log(T_meas^{-1} T_i T_j^{-1})."""
    return se3.log(se3.compose(se3.inverse(T_meas),
                               se3.compose(T_i, se3.inverse(T_j))))


def _residual_of_increments(xi_i, xi_j, T_i, T_j, T_meas):
    return edge_residual(se3.compose(se3.exp(xi_i), T_i),
                         se3.compose(se3.exp(xi_j), T_j), T_meas)


@functools.partial(jax.jit, static_argnames=("iters", "fix_first"))
def optimize_pose_graph(g: PoseGraph, iters: int = 20,
                        init_lambda: float = 1e-6,
                        fix_first: bool = True):
    """Returns (T_cw (K,4,4), final cost)."""
    K = g.T_cw.shape[0]
    z6 = jnp.zeros(6, jnp.float32)

    def edge_terms(T_cw):
        T_i = T_cw[g.edge_i]
        T_j = T_cw[g.edge_j]
        r = jax.vmap(edge_residual)(T_i, T_j, g.T_meas)  # (E, 6)
        Ji = jax.vmap(jax.jacfwd(_residual_of_increments, argnums=0)
                      )(jnp.zeros_like(r), jnp.zeros_like(r), T_i, T_j, g.T_meas)
        Jj = jax.vmap(jax.jacfwd(_residual_of_increments, argnums=1)
                      )(jnp.zeros_like(r), jnp.zeros_like(r), T_i, T_j, g.T_meas)
        return r, Ji, Jj  # (E,6), (E,6,6), (E,6,6)

    def build(T_cw):
        r, Ji, Jj = edge_terms(T_cw)
        w = (g.weight * g.valid).astype(jnp.float32)
        H = jnp.zeros((K, 6, K, 6))
        b = jnp.zeros((K, 6))
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        H = H.at[g.edge_i, :, g.edge_i, :].add(
            jnp.einsum("eij,eik->ejk", Jiw, Ji, precision=HI))
        H = H.at[g.edge_j, :, g.edge_j, :].add(
            jnp.einsum("eij,eik->ejk", Jjw, Jj, precision=HI))
        H = H.at[g.edge_i, :, g.edge_j, :].add(
            jnp.einsum("eij,eik->ejk", Jiw, Jj, precision=HI))
        H = H.at[g.edge_j, :, g.edge_i, :].add(
            jnp.einsum("eij,eik->ejk", Jjw, Ji, precision=HI))
        b = b.at[g.edge_i].add(-jnp.einsum("eij,ei->ej", Jiw, r, precision=HI))
        b = b.at[g.edge_j].add(-jnp.einsum("eij,ei->ej", Jjw, r, precision=HI))
        return H, b

    def cost_of(T_cw):
        r, _, _ = edge_terms(T_cw)
        return jnp.sum(jnp.sum(r * r, axis=-1) * g.weight * g.valid)

    def body(i, state):
        T_cw, lam, cost = state
        H, b = build(T_cw)
        if fix_first:
            H = H.at[0].set(0.0).at[:, :, 0, :].set(0.0)
            H = H.at[0, jnp.arange(6), 0, jnp.arange(6)].set(1.0)
            b = b.at[0].set(0.0)
        Hd = H.reshape(6 * K, 6 * K) + lam * jnp.eye(6 * K)
        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), b.reshape(-1)).reshape(K, 6)
        T_new = jax.vmap(lambda d, T: se3.compose(se3.exp(d), T))(dx, T_cw)
        c_new = cost_of(T_new)
        accept = c_new < cost
        T_cw = jnp.where(accept, T_new, T_cw)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-12),
                        jnp.minimum(lam * 10.0, 1e6))
        cost = jnp.where(accept, c_new, cost)
        return T_cw, lam, cost

    T_cw, _, cost = jax.lax.fori_loop(
        0, iters, body,
        (g.T_cw, jnp.asarray(init_lambda, jnp.float32), cost_of(g.T_cw)))
    return jax.vmap(se3.normalize)(T_cw), cost


def odometry_chain_edges(T_cw: jax.Array, noise_key=None):
    """Helper: consecutive-pose odometry edges from a trajectory."""
    K = T_cw.shape[0]
    i = jnp.arange(K - 1)
    j = i + 1
    T_meas = jax.vmap(lambda a, b: se3.compose(a, se3.inverse(b)))(
        T_cw[i], T_cw[j])
    return i, j, T_meas
