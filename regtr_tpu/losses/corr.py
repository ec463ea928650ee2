"""Correspondence (warped-keypoint) loss.

Dense/masked equivalent of CorrCriterion (/root/reference/src/models/losses/
corr_loss.py:9-39): per-point error between predicted warped keypoints and
GT-transformed keypoints, weighted by groundtruth overlap, globally
normalized by the total weight.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.se3 import se3_transform

_EPS = 1e-6


def corr_loss(kp, kp_warped_pred, pose_gt, overlap_weights, metric="mae"):
    """
    Args:
        kp: (B, N, 3) keypoints in their own frame.
        kp_warped_pred: (.., B, N, 3) predicted correspondences (arbitrary
            leading dims, e.g. per decoder layer).
        pose_gt: (B, 3, 4) GT transform from kp frame to partner frame.
        overlap_weights: (B, N) GT overlap in [0, 1]; padded points carry 0.

    Returns:
        (..,) loss, one value per leading dim.
    """
    kp_warped_gt = se3_transform(pose_gt, kp)          # (B, N, 3)
    err = kp_warped_pred - kp_warped_gt
    if metric == "mae":
        err = jnp.sum(jnp.abs(err), axis=-1)
    elif metric == "mse":
        err = jnp.sum(err * err, axis=-1)
    else:
        raise ValueError(metric)
    w = overlap_weights
    num = jnp.sum(w * err, axis=(-2, -1))
    den = jnp.maximum(jnp.sum(w, axis=(-2, -1)), _EPS)
    return num / den
