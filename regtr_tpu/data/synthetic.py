"""Synthetic shape dataset with the ModelNet sample contract.

Not part of the reference (which downloads ModelNet40); exists because this
environment has zero egress.  Generates point clouds sampled from simple
parametric surfaces (boxes, spheres, cylinders, unions thereof) with surface
normals — enough structure for the registration pipeline to learn/verify
end-to-end behavior, and shaped exactly like ModelNetHdf samples so the whole
transform/collate/train stack is exercised unmodified.
"""
from __future__ import annotations

import numpy as np

from .modelnet import modelnet_sample_to_pair


def _sample_box(rng, n, half):
    face_areas = np.array([
        half[1] * half[2], half[1] * half[2],
        half[0] * half[2], half[0] * half[2],
        half[0] * half[1], half[0] * half[1],
    ])
    faces = rng.choice(6, n, p=face_areas / face_areas.sum())
    pts = rng.uniform(-1, 1, (n, 3)) * half
    normals = np.zeros((n, 3))
    for f in range(6):
        axis, sign = f // 2, 1.0 if f % 2 == 0 else -1.0
        m = faces == f
        pts[m, axis] = sign * half[axis]
        normals[m, axis] = sign
    return pts, normals


def _sample_sphere(rng, n, radius):
    d = rng.randn(n, 3)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    return d * radius, d


def _sample_cylinder(rng, n, radius, half_h):
    side = rng.rand(n) < 0.7
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.zeros((n, 3))
    normals = np.zeros((n, 3))
    pts[:, 0] = np.cos(theta) * radius
    pts[:, 1] = np.sin(theta) * radius
    pts[:, 2] = rng.uniform(-half_h, half_h, n)
    normals[:, 0] = np.cos(theta)
    normals[:, 1] = np.sin(theta)
    cap = ~side
    r_cap = radius * np.sqrt(rng.rand(cap.sum()))
    th_cap = theta[cap]
    sign = np.where(rng.rand(cap.sum()) < 0.5, 1.0, -1.0)
    pts[cap, 0] = np.cos(th_cap) * r_cap
    pts[cap, 1] = np.sin(th_cap) * r_cap
    pts[cap, 2] = sign * half_h
    normals[cap] = 0.0
    normals[cap, 2] = sign
    return pts, normals


class SyntheticShapeDataset:
    """Deterministic (seeded) synthetic shapes, ModelNet-format samples."""

    def __init__(self, cfg, n_items=256, n_points=2048, transform=None,
                 seed=0):
        self.cfg = cfg
        self.n_items = n_items
        self.n_points = n_points
        self._transform = transform
        self.seed = seed

    def __len__(self):
        return self.n_items

    def _make_cloud(self, item):
        rng = np.random.RandomState(self.seed * 100003 + item)
        parts = rng.randint(1, 4)
        pts_all, nrm_all = [], []
        for _ in range(parts):
            kind = rng.randint(3)
            n = self.n_points // parts
            if kind == 0:
                p, nm = _sample_box(rng, n, rng.uniform(0.2, 0.5, 3))
            elif kind == 1:
                p, nm = _sample_sphere(rng, n, rng.uniform(0.2, 0.5))
            else:
                p, nm = _sample_cylinder(
                    rng, n, rng.uniform(0.15, 0.4), rng.uniform(0.2, 0.5)
                )
            offset = rng.uniform(-0.4, 0.4, 3)
            pts_all.append(p + offset)
            nrm_all.append(nm)
        pts = np.concatenate(pts_all)[: self.n_points]
        nrm = np.concatenate(nrm_all)[: self.n_points]
        scale = np.abs(pts).max() or 1.0
        pts = pts / scale * 0.5  # unit-ish scale like ModelNet
        return np.concatenate([pts, nrm], axis=1).astype(np.float32)

    def __getitem__(self, item):
        rng = np.random.RandomState(
            self.seed * 7919 + item
        )
        sample = {
            "points": self._make_cloud(item),
            "label": np.int64(0),
            "idx": np.int32(item),
        }
        if self._transform is not None:
            sample = self._transform(sample, rng)
        return modelnet_sample_to_pair(sample)
