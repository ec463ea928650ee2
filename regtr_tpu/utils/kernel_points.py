"""Deterministic kernel-point disposition generation.

The reference places K kernel points in a unit sphere by repulsion
optimization or spherical Lloyd iteration, caches the result to a .ply file,
and applies a *random* rotation + jitter at every model init
(/root/reference/src/models/backbone_kpconv/kernels/kernel_points.py:387-469).

We generate dispositions with a seeded Lloyd iteration (k-means over points
sampled uniformly in the unit ball) so the layout is bitwise-reproducible:
determinism is a framework-level goal here.  `fixed='center'` pins kernel
point 0 at the origin, matching the configs (`fixed_kernel_points: center`).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np


def _sample_ball(rng, n, dim):
    """Uniform samples in the unit ball."""
    x = rng.randn(n, dim)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    r = rng.rand(n, 1) ** (1.0 / dim)
    return x * r


@lru_cache(maxsize=16)
def kernel_dispositions(num_points: int, dim: int = 3, fixed: str = "center",
                        seed: int = 0) -> np.ndarray:
    """(K, dim) unit-sphere kernel point layout, deterministic in `seed`."""
    rng = np.random.RandomState(seed + 1000 * num_points)
    samples = _sample_ball(rng, 20000, dim)

    centers = _sample_ball(rng, num_points, dim)
    if fixed == "center":
        centers[0] = 0.0
    elif fixed == "verticals":
        centers[0] = 0.0
        if num_points > 1:
            centers[1] = np.eye(dim)[-1] * 0.66
        if num_points > 2:
            centers[2] = -np.eye(dim)[-1] * 0.66

    for _ in range(60):
        d = np.linalg.norm(samples[:, None] - centers[None], axis=-1)
        assign = np.argmin(d, axis=1)
        for k in range(num_points):
            pts = samples[assign == k]
            if len(pts) > 0:
                centers[k] = pts.mean(0)
        if fixed == "center":
            centers[0] = 0.0
        elif fixed == "verticals":
            centers[0] = 0.0

    # Small deterministic jitter to break any residual symmetry (the
    # reference uses gaussian 0.01 jitter with an unseeded RNG).
    centers = centers + rng.randn(*centers.shape) * 0.01
    if fixed == "center":
        centers[0] = 0.0
    return centers.astype(np.float32)


def load_kernel_points(radius: float, num_points: int, dim: int = 3,
                       fixed: str = "center", seed: int = 0) -> np.ndarray:
    """Kernel points scaled to the given conv radius (K, dim)."""
    return kernel_dispositions(num_points, dim, fixed, seed) * np.float32(radius)
