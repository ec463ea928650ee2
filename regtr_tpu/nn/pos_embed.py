"""Positional embeddings over continuous 3-D coordinates.

Equivalents of /root/reference/src/models/transformer/position_embedding.py:
sine embedding generalized to n dims (temperature 1e4, scale*2pi, zero-pad
remainder) and a learned MLP embedding.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class PositionEmbeddingCoordsSine(nn.Module):
    n_dim: int = 3
    d_model: int = 256
    temperature: float = 10000.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, xyz):
        """xyz (*, n_dim) -> (*, d_model)."""
        num_feats = self.d_model // self.n_dim // 2 * 2
        padding = self.d_model - num_feats * self.n_dim
        scale = self.scale * 2.0 * math.pi

        dim_t = jnp.arange(num_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

        pos = xyz * scale
        pos_divided = pos[..., None] / dim_t          # (*, n_dim, num_feats)
        pos_sin = jnp.sin(pos_divided[..., 0::2])
        pos_cos = jnp.cos(pos_divided[..., 1::2])
        emb = jnp.stack([pos_sin, pos_cos], axis=-1).reshape(
            xyz.shape[:-1] + (-1,)
        )
        if padding:
            emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, padding)])
        return emb


class PositionEmbeddingLearned(nn.Module):
    d_model: int = 256

    @nn.compact
    def __call__(self, xyz):
        h = xyz
        for width in (32, 64, 128, 256):
            h = nn.relu(nn.Dense(width)(h))
        return nn.Dense(self.d_model)(h)
