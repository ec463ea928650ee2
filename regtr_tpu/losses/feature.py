"""Feature losses: InfoNCE (with learned bilinear weight) and circle loss.

Dense/masked equivalents of /root/reference/src/models/losses/
feature_loss.py:52-314.  The InfoNCE `W` is a trainable (d, d) parameter
living in the model's param pytree (the reference keeps it inside the loss
criterion and it ends up in checkpoints — feature_loss.py:261-266).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.masking import masked_logsumexp

_INF = 1.0e9


def pairwise_sqdist(a, b):
    """(.., N, 3) x (.., M, 3) -> (.., N, M) squared distances, clamped >= 0."""
    a_sq = jnp.sum(a * a, axis=-1)[..., :, None]
    b_sq = jnp.sum(b * b, axis=-1)[..., None, :]
    cross = jnp.einsum(
        "...nc,...mc->...nm", a, b, preferred_element_type=jnp.float32
    )
    return jnp.maximum(a_sq - 2.0 * cross + b_sq, 0.0)


class InfoNCELoss(nn.Module):
    """Masked InfoNCE with learned symmetric bilinear similarity.

    For each valid anchor whose nearest positive-cloud point (under the GT
    alignment) is closer than r_p: positive = that nearest point; all other
    points within r_n are excluded from the denominator
    (feature_loss.py:284-295).
    """
    d_embed: int
    r_p: float
    r_n: float

    @nn.compact
    def __call__(self, anchor_feat, positive_feat, anchor_xyz, positive_xyz,
                 anchor_mask, positive_mask):
        """anchor_feat (B, Na, D); positive_feat (B, Np, D);
        anchor_xyz (B, Na, 3) already GT-aligned; positive_xyz (B, Np, 3);
        masks (B, Na)/(B, Np).  Returns scalar (mean over pairs)."""
        w = self.param(
            "W", nn.initializers.normal(stddev=0.1),
            (self.d_embed, self.d_embed),
        )
        w_triu = jnp.triu(w)
        w_sym = w_triu + w_triu.T
        logits = jnp.einsum(
            "bic,cd,bjd->bij", anchor_feat, w_sym, positive_feat,
            preferred_element_type=jnp.float32,
        )

        sqd = pairwise_sqdist(anchor_xyz, positive_xyz)
        sqd = jnp.where(positive_mask[:, None, :], sqd, _INF)
        idx1 = jnp.argmin(sqd, axis=-1)                     # (B, Na)
        d1 = jnp.take_along_axis(sqd, idx1[..., None], axis=-1)[..., 0]
        match_mask = (d1 < self.r_p ** 2) & anchor_mask     # (B, Na)

        pos_onehot = (
            jnp.arange(logits.shape[-1])[None, None, :] == idx1[..., None]
        )
        ignore = (sqd < self.r_n ** 2) & ~pos_onehot
        keep = ~ignore & positive_mask[:, None, :]

        pos_logit = jnp.take_along_axis(logits, idx1[..., None], axis=-1)[..., 0]
        lse = masked_logsumexp(logits, keep, axis=-1)       # (B, Na)
        per_anchor = -pos_logit + lse

        m = match_mask.astype(jnp.float32)
        per_pair = jnp.sum(per_anchor * m, axis=-1) / jnp.maximum(
            jnp.sum(m, axis=-1), 1.0
        )
        return jnp.mean(per_pair)


def circle_loss(feats_a, feats_b, xyz_a, xyz_b, mask_a, mask_b,
                r_p, r_n, log_scale=10.0, pos_margin=0.1, neg_margin=1.4,
                dist_type="euclidean"):
    """Masked circle loss over all descriptor pairs (CircleLossFull,
    feature_loss.py:160-243).  Returns scalar (mean over pairs)."""
    coords_dist = jnp.sqrt(pairwise_sqdist(xyz_a, xyz_b) + 1e-12)
    if dist_type == "euclidean":
        fd = jnp.sqrt(pairwise_sqdist(feats_a, feats_b) + 1e-12)
    elif dist_type == "cosine":
        num = jnp.einsum("bic,bjc->bij", feats_a, feats_b)
        den = jnp.maximum(
            jnp.linalg.norm(feats_a, axis=-1)[..., :, None]
            * jnp.linalg.norm(feats_b, axis=-1)[..., None, :],
            1e-8,
        )
        fd = 1.0 - num / den
    else:
        raise ValueError(dist_type)

    valid = mask_a[:, :, None] & mask_b[:, None, :]
    pos_mask = (coords_dist < r_p) & valid
    neg_mask = (coords_dist > r_n) & valid

    row_sel = jnp.any(pos_mask, -1) & jnp.any(neg_mask, -1)   # (B, Na)
    col_sel = jnp.any(pos_mask, -2) & jnp.any(neg_mask, -2)   # (B, Nb)

    pos = fd - 1e5 * (~pos_mask).astype(fd.dtype)
    pos_w = jax.lax.stop_gradient(jnp.maximum(pos - pos_margin, 0.0))
    lse_pos_row = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_w, axis=-1)
    lse_pos_col = jax.nn.logsumexp(log_scale * (pos - pos_margin) * pos_w, axis=-2)

    neg = fd + 1e5 * (~neg_mask).astype(fd.dtype)
    neg_w = jax.lax.stop_gradient(jnp.maximum(neg_margin - neg, 0.0))
    lse_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - neg) * neg_w, axis=-1)
    lse_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - neg) * neg_w, axis=-2)

    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale

    def sel_mean(x, sel):
        s = sel.astype(x.dtype)
        return jnp.sum(x * s) / jnp.maximum(jnp.sum(s), 1.0)

    return (sel_mean(loss_row, row_sel) + sel_mean(loss_col, col_sel)) / 2.0
