"""Deterministic fixed-K radius neighbor search.

TPU-native replacement for the reference's C++/nanoflann radius search
(/root/reference/src/models/backbone_kpconv/cpp_wrappers/cpp_neighbors/
neighbors/neighbors.cpp) and the non-deterministic PyTorch3D `ball_query`
GPU path (/root/reference/src/models/backbone_kpconv/kpconv.py:261-288).

Contract (matching the reference's shadow-neighbor convention,
neighbors.cpp:202 / kpconv_blocks.py:309):
  * returns an (Nq, K) int32 index table into the support cloud;
  * entries equal to Ns (the support count/capacity) are "shadow" neighbors
    pointing at an appended pad row;
  * only supports within `radius` are returned.

Improvement over the reference: we return the K *nearest* neighbors within
the radius (the reference returns the first K encountered in scan order,
which is both order-dependent and nondeterministic on GPU).  KPConv is
invariant to neighbor ordering, and nearest-K is a strictly better truncation
when a neighborhood overflows K.

Implementation: tiled top-k merge over support chunks (flash-attention-style
streaming), so the full (Nq, Ns) distance matrix is never materialized for
large clouds.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(3.0e38)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("k", "chunk"))
def radius_neighbors(
    queries,
    q_mask,
    supports,
    s_mask,
    radius,
    k: int,
    chunk: int = 1024,
):
    """K-nearest-within-radius neighbor table for one (masked) cloud pair.

    Args:
        queries: (Nq, 3); q_mask: (Nq,) bool.
        supports: (Ns, 3); s_mask: (Ns,) bool.
        radius: scalar search radius (may be traced).
        k: static number of neighbors to keep.
        chunk: static support tile size for the streaming merge.

    Returns:
        idx: (Nq, k) int32, shadow entries = Ns.
    """
    nq = queries.shape[0]
    ns = supports.shape[0]
    chunk = min(chunk, _round_up(ns, 8))
    ns_pad = _round_up(ns, chunk)
    n_chunks = ns_pad // chunk

    pad = ns_pad - ns
    supports_p = jnp.pad(supports, ((0, pad), (0, 0)))
    s_mask_p = jnp.pad(s_mask, (0, pad))

    # (n_chunks, chunk, 3) / (n_chunks, chunk)
    s_tiles = supports_p.reshape(n_chunks, chunk, 3)
    m_tiles = s_mask_p.reshape(n_chunks, chunk)

    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (Nq, 1)

    def step(carry, tile):
        best_d, best_i = carry  # (Nq, k) each
        s_pts, s_val, base = tile
        # Squared distances via the matmul expansion (MXU-friendly):
        # |q - s|^2 = |q|^2 - 2 q.s + |s|^2
        dots = queries @ s_pts.T  # (Nq, chunk)
        s_sq = jnp.sum(s_pts * s_pts, axis=-1)[None, :]
        d = q_sq - 2.0 * dots + s_sq
        d = jnp.maximum(d, 0.0)
        d = jnp.where(s_val[None, :], d, _INF)
        cand_i = (base + jnp.arange(chunk, dtype=jnp.int32))[None, :]
        cand_i = jnp.broadcast_to(cand_i, d.shape)

        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, cand_i], axis=1)
        neg_top, top_pos = jax.lax.top_k(-all_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(all_i, top_pos, axis=1)
        return (best_d, best_i), None

    init = (
        jnp.full((nq, k), _INF, jnp.float32),
        jnp.full((nq, k), ns, jnp.int32),
    )
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (best_d, best_i), _ = jax.lax.scan(step, init, (s_tiles, m_tiles, bases))

    r_sq = (radius * radius).astype(best_d.dtype)
    in_range = (best_d <= r_sq) & q_mask[:, None]
    idx = jnp.where(in_range, best_i, ns)
    return idx.astype(jnp.int32)


def radius_neighbors_batch(
    queries, q_mask, supports, s_mask, radius, k: int, chunk: int = 1024
):
    """vmapped radius_neighbors over a leading cloud-batch axis."""
    fn = partial(radius_neighbors, k=k, chunk=chunk)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, None))(
        queries, q_mask, supports, s_mask, radius
    )


def neighbor_counts(idx, ns):
    """Number of non-shadow neighbors per query: (.., K) -> (..,)."""
    return jnp.sum(idx < ns, axis=-1)
