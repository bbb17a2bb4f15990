"""Fused row scatters.

XLA lowers each `.at[idx].set(vals)` on TPU to a serial per-row scatter
kernel with ~1.8 ms of cost for a 2000-row update — and the map/keyframe
bookkeeping steps perform a dozen of them on arrays that share the SAME
destination rows. Packing every column into one uint32 matrix (f32/i32 via
bitcast, bool via 0/1; integer packing sidesteps any NaN canonicalization) turns N scatters into one.

This is the struct-of-arrays analogue of the reference writing one
`Feature`/`MapPoint` object per slot (e.g. Frame::AddKeys, Frame.cpp:118-137;
MapPoint ctor, MapPoint.cpp:13-43) — one pass over the slots, all fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _as_u32_cols(a: jax.Array) -> tuple[jax.Array, tuple]:
    """View any (N,) / (N, K) array of f32/i32/u32/bool as (N, K) u32 plus
    the metadata needed to reverse the view."""
    dt = a.dtype
    two_d = a if a.ndim == 2 else a[:, None]
    if dt == jnp.uint32:
        return two_d, (dt, a.ndim)
    if dt == jnp.bool_:
        return two_d.astype(jnp.uint32), (dt, a.ndim)
    return jax.lax.bitcast_convert_type(two_d, jnp.uint32), (dt, a.ndim)


def _from_u32_cols(cols: jax.Array, meta: tuple) -> jax.Array:
    dt, ndim = meta
    if dt == jnp.bool_:
        out = cols > 0
    elif dt == jnp.uint32:
        out = cols
    else:
        out = jax.lax.bitcast_convert_type(cols, dt)
    return out[:, 0] if ndim == 1 else out


def scatter_rows_set(dsts: list, idx: jax.Array, srcs: list) -> list:
    """Fused `dst.at[idx].set(src, mode="drop")` over a list of arrays that
    share destination rows. dsts[i]: (M,) or (M, K); srcs[i]: (N,) or (N, K)
    matching dtype/trailing shape. Returns the updated list."""
    assert len(dsts) == len(srcs)
    dcols, metas, widths = [], [], []
    scols = []
    for d, s in zip(dsts, srcs):
        dc, meta = _as_u32_cols(d)
        sc, _ = _as_u32_cols(s)
        dcols.append(dc)
        scols.append(sc)
        metas.append(meta)
        widths.append(dc.shape[1])
    packed_d = jnp.concatenate(dcols, axis=1)
    packed_s = jnp.concatenate(scols, axis=1)
    packed = packed_d.at[idx].set(packed_s, mode="drop")
    out, off = [], 0
    for meta, w in zip(metas, widths):
        out.append(_from_u32_cols(packed[:, off:off + w], meta))
        off += w
    return out
