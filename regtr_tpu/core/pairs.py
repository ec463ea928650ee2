"""Paired-cloud batch layout helpers.

A batch of B registration pairs is stored as 2B clouds INTERLEAVED:
slot 2i = source of pair i, slot 2i+1 = target of pair i.

Why interleaved (and not [all sources; all targets]): under data-parallel
sharding of the cloud-batch axis, each device then holds whole pairs, so the
partner-swap used by cross-attention and the pose solve is a device-local
reshape instead of a cross-device permute.
"""
from __future__ import annotations

import jax.numpy as jnp


def interleave_pairs(src, tgt, axis: int = 0):
    """(B, ...) x2 -> (2B, ...) with pairs adjacent."""
    stacked = jnp.stack([src, tgt], axis=axis + 1)
    shape = list(stacked.shape)
    shape[axis:axis + 2] = [shape[axis] * 2]
    return stacked.reshape(shape)


def split_pairs(x, axis: int = 0):
    """(2B, ...) -> (src (B, ...), tgt (B, ...))."""
    shape = list(x.shape)
    shape[axis:axis + 1] = [shape[axis] // 2, 2]
    y = x.reshape(shape)
    src = jnp.take(y, 0, axis=axis + 1)
    tgt = jnp.take(y, 1, axis=axis + 1)
    return src, tgt


def swap_pairs(x, axis: int = 0):
    """(2B, ...) -> (2B, ...) with each cloud replaced by its partner."""
    shape = list(x.shape)
    shape[axis:axis + 1] = [shape[axis] // 2, 2]
    y = x.reshape(shape)
    y = jnp.flip(y, axis=axis + 1)
    return y.reshape(x.shape)
