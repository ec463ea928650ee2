"""Overlap (binary cross-entropy) loss over masked points.

Equivalent of the BCEWithLogitsLoss applied at /root/reference/src/models/
regtr.py:78,249-252 — mean over all valid points of both clouds.
"""
from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits, labels):
    """Numerically stable elementwise BCE with logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def overlap_loss(logits, labels, mask):
    """logits (..., N); labels (..., N) in [0,1]; mask (..., N) bool.

    Returns scalar masked mean over every valid element."""
    elt = bce_with_logits(logits, labels)
    m = mask.astype(elt.dtype)
    return jnp.sum(elt * m) / jnp.maximum(jnp.sum(m), 1.0)
