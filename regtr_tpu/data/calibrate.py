"""Offline calibration of the static shape schedule.

Equivalent of calibrate_neighbors (/root/reference/src/models/
backbone_kpconv/kpconv.py:702-734), extended to also calibrate the
TPU-specific static capacities that the reference doesn't need:
  * neighborhood_limits: per-level K covering keep_ratio of all neighbors;
  * level_capacities: max points per pyramid level over the dataset;
  * cell_capacity: max supports per grid cell for the bucketed search.
Runs on the host against the native library (fast C++), so calibration
doesn't touch the device.
"""
from __future__ import annotations

import logging

import numpy as np

from .. import native_bindings as nb
from ..ops.pyramid import count_pyramid_levels

_logger = logging.getLogger(__name__)


def calibrate(dataset, cfg, num_samples: int = 50, keep_ratio: float = 0.8,
              safety: float = 1.15):
    """Measure shape statistics over dataset samples.

    Returns a dict with suggested neighborhood_limits, level_capacities
    (excluding level 0, which is the bucket size), and cell_capacity.
    """
    num_levels = count_pyramid_levels(cfg["architecture"])
    r0 = float(cfg["first_subsampling_dl"]) * float(cfg["conv_radius"])

    hist_max = 512
    neighb_hists = np.zeros((num_levels, hist_max), np.int64)
    level_counts = [[] for _ in range(num_levels)]
    cell_max = 0

    n = min(len(dataset), num_samples)
    for i in range(n):
        sample = dataset[i]
        for cloud in (sample["src_xyz"], sample["tgt_xyz"]):
            pts = np.asarray(cloud, np.float32)
            r = r0
            for lvl in range(num_levels):
                level_counts[lvl].append(len(pts))
                idx = nb.radius_neighbors(pts, pts, r, hist_max)
                counts = (idx < len(pts)).sum(1)
                neighb_hists[lvl] += np.bincount(
                    np.clip(counts, 0, hist_max - 1), minlength=hist_max
                )
                # grid-cell occupancy at this level's search radius
                cells = np.floor(pts / r).astype(np.int64)
                _, cell_counts = np.unique(cells, axis=0, return_counts=True)
                cell_max = max(cell_max, int(cell_counts.max()))
                if lvl + 1 < num_levels:
                    pts = nb.grid_subsample(pts, 2.0 * r / cfg["conv_radius"])
                r *= 2.0

    cum = np.cumsum(neighb_hists, axis=1)
    totals = cum[:, -1]
    limits = [
        int(np.searchsorted(cum[lvl], keep_ratio * totals[lvl]) + 1)
        for lvl in range(num_levels)
    ]
    caps = [
        int(np.ceil(max(level_counts[lvl]) * safety))
        for lvl in range(num_levels)
    ]
    result = {
        "neighborhood_limits": limits,
        "level_capacities": caps,
        "cell_capacity": int(np.ceil(cell_max * safety)),
        "num_samples": n,
    }
    _logger.info("calibration: %s", result)
    return result
