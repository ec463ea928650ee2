"""Experiment: per-tile neighbor index spread under z-major vs Morton sort.

Determines the static window W for the windowed one-hot KPConv kernel.
Pure numpy/scipy on CPU.  Dev tool.
"""
from __future__ import annotations

import os
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def part1by2(x):
    x = x.astype(np.uint64)
    x &= 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_key(ijk):
    return (part1by2(ijk[:, 0])
            | (part1by2(ijk[:, 1]) << np.uint64(1))
            | (part1by2(ijk[:, 2]) << np.uint64(2)))


def zmajor_key(ijk):
    return (ijk[:, 0].astype(np.int64)
            | (ijk[:, 1].astype(np.int64) << 10)
            | (ijk[:, 2].astype(np.int64) << 20))


def spreads(pts, order, radius, k, t=128):
    p = pts[order]
    tree = cKDTree(p)
    d, idx = tree.query(p, k=k, distance_upper_bound=radius)
    valid = np.isfinite(d)
    spread_list, drop1024, drop1536, drop2048, total = [], 0, 0, 0, 0
    n = len(p)
    for q0 in range(0, n, t):
        tile_idx = idx[q0:q0 + t][valid[q0:q0 + t]]
        if tile_idx.size == 0:
            continue
        lo = tile_idx.min()
        spread_list.append(tile_idx.max() - lo + 1)
        total += tile_idx.size
        for W, ctr in ((1024, 0), (1536, 1), (2048, 2)):
            dr = int((tile_idx - lo >= W).sum())
            if ctr == 0:
                drop1024 += dr
            elif ctr == 1:
                drop1536 += dr
            else:
                drop2048 += dr
    s = np.asarray(spread_list)
    qs = np.quantile(s, [0.5, 0.9, 0.99, 1.0])
    return qs, (drop1024 / total, drop1536 / total, drop2048 / total)


def main():
    import torch

    base = "/root/reference/data/indoor/test/7-scenes-redkitchen"
    for fname in ("cloud_bin_0.pth", "cloud_bin_5.pth"):
        pts = np.asarray(torch.load(f"{base}/{fname}", weights_only=False),
                         np.float32)[:20480]
        for dl, radius, k, label in ((0.025, 0.0625, 40, "L0"),):
            origin = pts.min(0)
            ijk = np.floor((pts - origin) / dl).astype(np.int64)
            for name, keyfn in (("zmajor", zmajor_key), ("morton", morton_key)):
                key = keyfn(ijk)
                order = np.argsort(key, kind="stable")
                qs, drops = spreads(pts, order, radius, k)
                print(f"{fname} {label} {name:7s} spread p50={qs[0]:6.0f} "
                      f"p90={qs[1]:6.0f} p99={qs[2]:6.0f} max={qs[3]:6.0f}  "
                      f"drop@1024={drops[0]:.4%} @1536={drops[1]:.4%} "
                      f"@2048={drops[2]:.4%}", flush=True)


if __name__ == "__main__":
    main()
