"""Masked-array utilities.

The TPU-native layout is dense `(B, N_cap, ...)` arrays plus boolean validity
masks `(B, N_cap)`, replacing the reference's packed ragged stacks +
`stack_lengths` bookkeeping (/root/reference/src/utils/seq_manipulation.py).
Everything here is shape-static and jit-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9  # large-but-finite; avoids NaN from (-inf) - (-inf)


def lengths_to_mask(lengths, max_len):
    """(B,) int lengths -> (B, max_len) bool validity mask."""
    idx = jnp.arange(max_len)[None, :]
    return idx < lengths[:, None]


def masked_mean(x, mask, axis, keepdims=False, eps=1e-12):
    """Mean of x over `axis` counting only entries where mask is True.

    mask must broadcast against x.
    """
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, eps)


def masked_var(x, mask, axis, keepdims=False, eps=1e-12):
    """Biased variance over valid entries (matches torch InstanceNorm)."""
    mean = masked_mean(x, mask, axis, keepdims=True, eps=eps)
    var = masked_mean((x - mean) ** 2, mask, axis, keepdims=keepdims, eps=eps)
    return var


def masked_instance_norm(x, mask, eps=1e-5):
    """Per-cloud, per-channel normalization over valid points.

    x: (B, N, C), mask: (B, N).  Equivalent to the reference's per-cloud
    InstanceNorm1d (/root/reference/src/models/backbone_kpconv/
    kpconv_blocks.py:510-519) but over a masked dense layout.  No affine
    parameters (torch InstanceNorm1d default affine=False).
    """
    m = mask[..., None]
    mean = masked_mean(x, m, axis=-2, keepdims=True)
    var = masked_mean((x - mean) ** 2, m, axis=-2, keepdims=True)
    normed = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return jnp.where(m, normed, 0.0)


def masked_softmax(logits, mask, axis=-1):
    """Softmax where `mask` marks valid logits.

    Rows with no valid entry return all-zeros (not NaN).
    """
    neg = jnp.asarray(NEG_INF, dtype=logits.dtype)
    masked_logits = jnp.where(mask, logits, neg)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    e = jnp.exp(masked_logits - m) * mask.astype(logits.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-20)


def masked_logsumexp(logits, mask, axis=-1):
    """logsumexp over valid entries; fully-masked rows return NEG_INF."""
    neg = jnp.asarray(NEG_INF, dtype=logits.dtype)
    masked_logits = jnp.where(mask, logits, neg)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    m_safe = jnp.maximum(m, neg)  # avoid -inf propagation
    e = jnp.exp(masked_logits - m_safe) * mask.astype(logits.dtype)
    s = jnp.sum(e, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    out = jnp.squeeze(m_safe, axis) + jnp.log(jnp.maximum(s, 1e-30))
    return jnp.where(any_valid, out, neg)


def masked_max(x, mask, axis, initial=0.0):
    """Max over valid entries; rows with no valid entry return `initial`."""
    filled = jnp.where(mask, x, jnp.asarray(NEG_INF, x.dtype))
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(any_valid, out, jnp.asarray(initial, x.dtype))
