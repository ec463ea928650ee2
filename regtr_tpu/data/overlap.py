"""Groundtruth overlap computation between aligned cloud pairs (host side).

Equivalent of /root/reference/src/utils/pointcloud.py:8-65 (open3d KD-tree
radius search both directions -> per-point overlap masks + mutual
correspondence indices), built on scipy's cKDTree.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def compute_overlap(src: np.ndarray, tgt: np.ndarray, search_radius: float):
    """
    Args:
        src: (N, 3) source points, already transformed into the target frame.
        tgt: (M, 3) target points.
        search_radius: match radius.

    Returns:
        (src_mask (N,), tgt_mask (M,), src_tgt_corr (2, K) mutual matches)
    """
    src = np.asarray(src, np.float32)
    tgt = np.asarray(tgt, np.float32)
    src_tree = cKDTree(src)
    tgt_tree = cKDTree(tgt)

    # Nearest neighbor within radius in each direction (-1 = none).
    d_s, i_s = tgt_tree.query(src, k=1, distance_upper_bound=search_radius)
    src_corr = np.where(np.isfinite(d_s), i_s, -1).astype(np.int64)
    src_corr[src_corr >= len(tgt)] = -1

    d_t, i_t = src_tree.query(tgt, k=1, distance_upper_bound=search_radius)
    tgt_corr = np.where(np.isfinite(d_t), i_t, -1).astype(np.int64)
    tgt_corr[tgt_corr >= len(src)] = -1

    # Mutual correspondences (reference requires src_corr > 0 — a documented
    # quirk excluding target index 0; we use >= 0, the intended behavior).
    mutual = (src_corr >= 0) & (tgt_corr[np.clip(src_corr, 0, None)] ==
                                np.arange(len(src)))
    src_tgt_corr = np.stack(
        [np.nonzero(mutual)[0], src_corr[mutual]]
    ).astype(np.int64)

    return src_corr >= 0, tgt_corr >= 0, src_tgt_corr
