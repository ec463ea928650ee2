"""Correspondence decoding heads.

Equivalents of CorrespondenceRegressor / CorrespondenceDecoder
(/root/reference/src/models/regtr.py:297-443) over the dense paired layout.
Inputs are the per-layer conditioned features (L, 2B, N, D); outputs are the
predicted corresponding coordinates in the partner cloud (L, 2B, N, 3) and
per-point overlap logits (L, 2B, N, 1).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.masking import NEG_INF
from ..core.pairs import swap_pairs


class CorrespondenceRegressor(nn.Module):
    """3-layer MLP coordinate regression + overlap logit (the config-default
    path: `direct_regress_coor: True`)."""
    d_embed: int

    @nn.compact
    def __call__(self, feats, xyz=None, pos=None, mask=None):
        h = nn.relu(nn.Dense(self.d_embed, name="coor_mlp0")(feats))
        h = nn.relu(nn.Dense(self.d_embed, name="coor_mlp1")(h))
        corr = nn.Dense(3, name="coor_mlp2")(h)
        overlap = nn.Dense(1, name="conf_logits")(feats)
        return corr, overlap


class CorrespondenceDecoder(nn.Module):
    """Single-head attention decoder: project q/k only, attend into the
    partner cloud, value = raw partner xyz (regtr.py:297-396).

    num_neighbors > 0 restricts each query's attention to its
    num_neighbors highest-scoring partner points before the softmax —
    the intent of the reference's `num_neighbors` option (regtr.py:341-348;
    its `neighbor_mask[:, :, haha] = 0` indexing zeroes whole columns
    rather than per-row entries, so we implement the documented intent,
    not the bug)."""
    d_embed: int
    use_pos_emb: bool = True
    num_neighbors: int = 0

    @nn.compact
    def __call__(self, feats, xyz, pos, mask):
        """feats (L, 2B, N, D); xyz (2B, N, 3); pos (2B, N, D); mask (2B, N)."""
        if self.use_pos_emb and pos is not None:
            feats_q = feats + pos[None]
        else:
            feats_q = feats

        q = nn.Dense(self.d_embed, name="q_proj")(feats_q) / jnp.sqrt(
            jnp.asarray(self.d_embed, jnp.float32)
        )
        k = nn.Dense(self.d_embed, name="k_proj")(feats_q)

        # swap partners along the cloud-batch axis (axis 1 of L,2B,N,D)
        k_partner = swap_pairs(k, axis=1)
        v_partner = swap_pairs(xyz)                       # (2B, N, 3)
        mask_partner = swap_pairs(mask)                   # (2B, N)

        attn = jnp.einsum(
            "lbqd,lbkd->lbqk", q, k_partner,
            preferred_element_type=jnp.float32,
        )
        attn = jnp.where(
            mask_partner[None, :, None, :], attn,
            jnp.asarray(NEG_INF, attn.dtype),
        )
        if self.num_neighbors > 0 and self.num_neighbors < attn.shape[-1]:
            # Keep only the top-k scores per query (ties at the threshold
            # are all kept — harmless, and avoids a scatter).
            kth = jax.lax.top_k(attn, self.num_neighbors)[0][..., -1:]
            attn = jnp.where(attn >= kth, attn,
                             jnp.asarray(NEG_INF, attn.dtype))
        attn = nn.softmax(attn, axis=-1)
        corr = jnp.einsum(
            "lbqk,bkc->lbqc", attn, v_partner,
            preferred_element_type=jnp.float32,
        )
        overlap = nn.Dense(1, name="conf_logits")(feats)
        return corr, overlap
