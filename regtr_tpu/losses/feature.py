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


def _feature_dist(feats_a, feats_b, dist_type):
    """(B, Na, D) x (B, Nb, D) -> (B, Na, Nb) descriptor distances."""
    if dist_type == "euclidean":
        return jnp.sqrt(pairwise_sqdist(feats_a, feats_b) + 1e-12)
    elif dist_type == "cosine":
        num = jnp.einsum("bic,bjc->bij", feats_a, feats_b)
        den = jnp.maximum(
            jnp.linalg.norm(feats_a, axis=-1)[..., :, None]
            * jnp.linalg.norm(feats_b, axis=-1)[..., None, :],
            1e-8,
        )
        return 1.0 - num / den
    raise ValueError(dist_type)


def _circle_core(coords_dist, fd, valid, r_p, r_n,
                 log_scale, pos_margin, neg_margin):
    """Circle loss on precomputed distance matrices (the shared math of
    CircleLoss.get_circle_loss / CircleLossFull, feature_loss.py:86-126,
    :160-243).  coords_dist/fd/valid: (B, Na, Nb)."""
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


def circle_loss(feats_a, feats_b, xyz_a, xyz_b, mask_a, mask_b,
                r_p, r_n, log_scale=10.0, pos_margin=0.1, neg_margin=1.4,
                dist_type="euclidean"):
    """Masked circle loss over all descriptor pairs (CircleLossFull,
    feature_loss.py:160-243).  Returns scalar (mean over pairs)."""
    coords_dist = jnp.sqrt(pairwise_sqdist(xyz_a, xyz_b) + 1e-12)
    fd = _feature_dist(feats_a, feats_b, dist_type)
    valid = mask_a[:, :, None] & mask_b[:, None, :]
    return _circle_core(coords_dist, fd, valid, r_p, r_n,
                        log_scale, pos_margin, neg_margin)


def sample_correspondences(key, xyz_a, xyz_b, mask_a, mask_b, r_p, n_sample):
    """Uniformly sample n_sample GT correspondences per pair.

    A correspondence is any valid (i, j) with |xyz_a_i - xyz_b_j| < r_p - 1e-3
    (the reference finds these with a radius search, feature_loss.py:137-139).
    Sampling is without replacement when at least n_sample candidates exist,
    else with replacement (matching `np.random.choice(..., replace=len <
    n_sample)` at feature_loss.py:145-147), realised fixed-shape via Gumbel
    top-k with a categorical fallback per slot.

    Returns (idx_a, idx_b, valid): (B, n_sample) each; `valid` is False for
    pairs with zero candidates (whose indices are arbitrary).
    """
    sqd = pairwise_sqdist(xyz_a, xyz_b)
    cand = (sqd < (r_p - 1e-3) ** 2) & mask_a[:, :, None] & mask_b[:, None, :]
    b, na, nb = cand.shape
    flat = cand.reshape(b, na * nb)
    neg = jnp.asarray(-1e30, jnp.float32)

    k1, k2 = jax.random.split(key)
    gumbel = jax.random.gumbel(k1, flat.shape, jnp.float32)
    scores = jnp.where(flat, gumbel, neg)
    top_val, top_idx = jax.lax.top_k(scores, n_sample)        # (B, n_sample)

    logits = jnp.where(flat, 0.0, neg)
    idx_wr = jax.random.categorical(k2, logits[:, None, :], axis=-1,
                                    shape=(b, n_sample))
    slot_ok = top_val > neg / 2
    idx = jnp.where(slot_ok, top_idx, idx_wr)
    valid = jnp.any(flat, axis=-1, keepdims=True) & jnp.ones(
        (b, n_sample), bool
    )
    return idx // nb, idx % nb, valid


def circle_loss_sampled(feats_a, feats_b, xyz_a, xyz_b, mask_a, mask_b,
                        r_p, r_n, key=None, n_sample=256, log_scale=10.0,
                        pos_margin=0.1, neg_margin=1.4,
                        dist_type="euclidean"):
    """Sampled circle loss (CircleLoss, feature_loss.py:52-157): draw
    n_sample GT correspondences per pair, then run circle loss on the
    (n_sample, n_sample) sampled distance matrices — reference cost
    characteristics independent of cloud size.

    If `key` is None a key is derived from the coordinates, so the sampling
    is random across batches but reproducible (determinism is a framework
    goal; the reference uses global np.random state here).
    """
    if key is None:
        bits = jax.lax.bitcast_convert_type(
            jnp.sum(xyz_a, dtype=jnp.float32), jnp.int32
        )
        key = jax.random.fold_in(jax.random.PRNGKey(17), bits)
    from ..ops.kpconv import batched_row_gather

    idx_a, idx_b, valid = sample_correspondences(
        key, xyz_a, xyz_b, mask_a, mask_b, r_p, n_sample
    )
    # Row gathers go through batched_row_gather per the repo perf invariant
    # (flat 1-D take + segment-sum custom VJP; take_along_axis pays the
    # serialized scatter-add backward).
    idx_a = idx_a.astype(jnp.int32)
    idx_b = idx_b.astype(jnp.int32)
    fa = batched_row_gather(feats_a, idx_a)
    fb = batched_row_gather(feats_b, idx_b)
    xa = batched_row_gather(xyz_a, idx_a)
    xb = batched_row_gather(xyz_b, idx_b)

    coords_dist = jnp.sqrt(pairwise_sqdist(xa, xb) + 1e-12)
    fd = _feature_dist(fa, fb, dist_type)
    valid_mat = valid[:, :, None] & valid[:, None, :]
    return _circle_core(coords_dist, fd, valid_mat, r_p, r_n,
                        log_scale, pos_margin, neg_margin)
