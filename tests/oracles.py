"""Pure-numpy oracles reproducing the reference C++ preprocessing semantics.

Used to validate the JAX/TPU kernels.  Semantics cited from:
  * grid subsample: /root/reference/src/models/backbone_kpconv/cpp_wrappers/
    cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-106
  * radius search: /root/reference/src/models/backbone_kpconv/cpp_wrappers/
    cpp_neighbors/neighbors/neighbors.cpp
"""
import numpy as np


def grid_subsample_oracle(points, voxel_size):
    """Barycenter voxel subsample; returns points sorted by voxel key."""
    origin = np.floor(points.min(axis=0) / voxel_size) * voxel_size
    ijk = np.floor((points - origin) / voxel_size).astype(np.int64)
    key = ijk[:, 0] + (ijk[:, 1] << 10) + (ijk[:, 2] << 20)
    order = np.argsort(key, kind="stable")
    key_s, pts_s = key[order], points[order]
    uniq, inverse = np.unique(key_s, return_inverse=True)
    out = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.float64)
    np.add.at(out, inverse, pts_s)
    np.add.at(cnt, inverse, 1.0)
    return (out / cnt[:, None]).astype(np.float32)


def knn_radius_oracle(queries, supports, radius, k):
    """K nearest within radius; shadow index = len(supports)."""
    ns = len(supports)
    d = np.linalg.norm(queries[:, None] - supports[None, :], axis=-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    dk = np.take_along_axis(d, idx, axis=1)
    out = np.where(dk <= radius, idx, ns)
    if out.shape[1] < k:
        out = np.pad(out, ((0, 0), (0, k - out.shape[1])), constant_values=ns)
    return out.astype(np.int32)


def kpconv_oracle(q_pts, s_pts, neighb_inds, x, kernel_pts, weights, extent):
    """Dense-math KPConv reference (linear influence, sum aggregation).

    Mirrors /root/reference/src/models/backbone_kpconv/kpconv_blocks.py:
    304-412 with mask-based neighbor-count normalization.
    """
    ns = s_pts.shape[0]
    s_pad = np.concatenate([s_pts, np.full((1, 3), 1e6, s_pts.dtype)], 0)
    x_pad = np.concatenate([x, np.zeros((1, x.shape[1]), x.dtype)], 0)
    neighbors = s_pad[neighb_inds] - q_pts[:, None, :]       # (N, K, 3)
    diff = neighbors[:, :, None, :] - kernel_pts[None, None]  # (N, K, P, 3)
    sq_d = np.sum(diff ** 2, axis=-1)                         # (N, K, P)
    infl = np.clip(1.0 - np.sqrt(sq_d) / extent, 0.0, None)   # (N, K, P)
    neighb_x = x_pad[neighb_inds]                             # (N, K, C)
    weighted = np.einsum("nkp,nkc->npc", infl, neighb_x)      # (N, P, C)
    out = np.einsum("npc,pcd->nd", weighted, weights)
    n_valid = np.maximum((neighb_inds < ns).sum(-1), 1)
    return out / n_valid[:, None]
