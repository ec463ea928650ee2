"""Experiment: per-group (t=8/16/32) window spreads, z-major vs Hilbert.

Sizes the two-level windowed KPConv kernel (tile window + per-group slab).
Dev tool; CPU numpy.
"""
from __future__ import annotations

import os
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zmajor_key(ijk):
    return (ijk[:, 0].astype(np.int64)
            | (ijk[:, 1].astype(np.int64) << 10)
            | (ijk[:, 2].astype(np.int64) << 20))


def hilbert_key(ijk, bits=10):
    """Skilling's transpose Hilbert encoding, vectorized (3-D)."""
    x = ijk.astype(np.uint32).copy()  # (n, 3)
    n = 3
    m = np.uint32(1) << np.uint32(bits - 1)
    # inverse undo excess work
    q = m
    while q > 1:
        p = q - np.uint32(1)
        for i in range(n):
            sel = (x[:, i] & q) != 0
            # invert low bits of x[0] where selected
            x[sel, 0] ^= p
            # exchange low bits of x[i] and x[0] where not selected
            t = (x[~sel, 0] ^ x[~sel, i]) & p
            x[~sel, 0] ^= t
            x[~sel, i] ^= t
        q >>= np.uint32(1)
    # gray encode
    for i in range(1, n):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(len(x), np.uint32)
    q = m
    while q > 1:
        sel = (x[:, n - 1] & q) != 0
        t[sel] ^= q - np.uint32(1)
        q >>= np.uint32(1)
    for i in range(n):
        x[:, i] ^= t
    # interleave bits of the transpose: bit b of axis i -> position b*n + (n-1-i)
    key = np.zeros(len(x), np.uint64)
    for b in range(bits):
        for i in range(n):
            bit = (x[:, i] >> np.uint32(b)) & np.uint32(1)
            key |= bit.astype(np.uint64) << np.uint64(b * n + (n - 1 - i))
    return key


def group_spreads(pts, order, radius, k, t):
    p = pts[order]
    tree = cKDTree(p)
    d, idx = tree.query(p, k=k, distance_upper_bound=radius)
    valid = np.isfinite(d)
    n = len(p)
    spread_list = []
    drops = {256: 0, 512: 0, 1024: 0, 2048: 0}
    total = 0
    for q0 in range(0, n, t):
        tile_idx = idx[q0:q0 + t][valid[q0:q0 + t]]
        if tile_idx.size == 0:
            continue
        lo = tile_idx.min()
        spread_list.append(tile_idx.max() - lo + 1)
        total += tile_idx.size
        for W in drops:
            drops[W] += int((tile_idx - lo >= W).sum())
    s = np.asarray(spread_list)
    qs = np.quantile(s, [0.5, 0.9, 0.99, 1.0])
    return qs, {W: c / total for W, c in drops.items()}


def main():
    import torch

    base = "/root/reference/data/indoor/test/7-scenes-redkitchen"
    for fname in ("cloud_bin_0.pth", "cloud_bin_5.pth"):
        pts = np.asarray(torch.load(f"{base}/{fname}", weights_only=False),
                         np.float32)[:20480]
        dl, radius, k = 0.025, 0.0625, 40
        origin = pts.min(0)
        ijk = np.floor((pts - origin) / dl).astype(np.int64)
        for name, keyfn in (("zmajor", zmajor_key), ("hilbert", hilbert_key)):
            key = keyfn(ijk)
            order = np.argsort(key, kind="stable")
            for t in (8, 16, 32, 128):
                qs, drops = group_spreads(pts, order, radius, k, t)
                dstr = " ".join(f"@{W}={v:.3%}" for W, v in drops.items())
                print(f"{fname[:11]} {name:7s} t={t:3d} spread "
                      f"p50={qs[0]:6.0f} p99={qs[2]:6.0f} max={qs[3]:6.0f} "
                      f"drop {dstr}", flush=True)


if __name__ == "__main__":
    main()
