"""Tests for the synthetic shape generator + crop-range pipeline (round 5).

The generator is this environment's stand-in for ModelNet/3DMatch data
(zero egress), so its invariants — determinism, unit normals, finite
coords, the ModelNet sample contract — are what the whole training stack
rests on.  No reference analogue (the reference downloads real data).
"""
from __future__ import annotations

import numpy as np
import pytest

from regtr_tpu.data.modelnet_transforms import get_transforms
from regtr_tpu.data.synthetic import (
    N_PART_KINDS, SyntheticShapeDataset, _random_rotation, _sample_part,
)


class TestPartSamplers:
    @pytest.mark.parametrize("kind", range(N_PART_KINDS))
    def test_families_finite_unit_normals(self, kind):
        rng = np.random.RandomState(kind)
        pts, nrm = _sample_part(rng, kind, 500)
        assert pts.shape == (500, 3) and nrm.shape == (500, 3)
        assert np.isfinite(pts).all() and np.isfinite(nrm).all()
        lens = np.linalg.norm(nrm, axis=1)
        # all families emit unit normals except flat caps that zero two
        # components and set the third to +-1 (still unit)
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)

    def test_random_rotation_is_orthonormal(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            r = _random_rotation(rng)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(r) > 0.99


class TestSyntheticDataset:
    def _ds(self, **kw):
        _, test_t = get_transforms("crop", num_points=512,
                                   predator_compat=False)
        kw.setdefault("transform", test_t)
        return SyntheticShapeDataset({}, n_items=8, n_points=1024, **kw)

    def test_deterministic_per_item(self):
        a, b = self._ds(), self._ds()
        s0, s1 = a[3], b[3]
        np.testing.assert_array_equal(s0["src_xyz"], s1["src_xyz"])
        np.testing.assert_array_equal(s0["pose"], s1["pose"])

    def test_seed_changes_items(self):
        a, b = self._ds(seed=0), self._ds(seed=1)
        assert not np.array_equal(a[0]["src_xyz"], b[0]["src_xyz"])

    def test_modelnet_contract(self):
        s = self._ds()[0]
        for k in ("src_xyz", "tgt_xyz", "tgt_raw", "src_overlap",
                  "tgt_overlap", "correspondences", "pose", "corr_xyz"):
            assert k in s, k
        assert s["pose"].shape == (3, 4)
        assert s["src_xyz"].shape[1] == 3
        assert s["src_overlap"].shape[0] == s["src_xyz"].shape[0]
        assert np.isfinite(s["src_xyz"]).all()
        # clouds are centered and unit-ish scale (ModelNet convention)
        assert np.abs(s["tgt_raw"]).max() <= 0.5 + 1e-5

    def test_room_and_object_modes_both_appear(self):
        # mode is drawn per item at p=0.4; 32 items make both near-certain
        ds = SyntheticShapeDataset({}, n_items=32, n_points=512)
        kinds = set()
        for i in range(32):
            rng = np.random.RandomState(ds.seed * 100003 + i)
            kinds.add(bool(rng.rand() < 0.4))
        assert kinds == {True, False}


class TestPartialRange:
    def test_range_varies_sizes_and_fixed_does_not(self):
        train_fixed, _ = get_transforms(
            "crop", num_points=512, partial_p_keep=[0.7, 0.7],
            predator_compat=False)
        train_rng, _ = get_transforms(
            "crop", num_points=512, partial_p_keep=[0.7, 0.7],
            predator_compat=False, partial_range=(0.5, 0.85))
        ds_f = SyntheticShapeDataset({}, n_items=8, n_points=1024,
                                     transform=train_fixed)
        ds_r = SyntheticShapeDataset({}, n_items=8, n_points=1024,
                                     transform=train_rng)
        sizes_f = {ds_f[i]["src_xyz"].shape[0] for i in range(8)}
        sizes_r = {ds_r[i]["src_xyz"].shape[0] for i in range(8)}
        assert sizes_f == {int(np.ceil(0.7 * 512))}
        assert len(sizes_r) > 1
        lo = int(np.ceil(0.5 * 512)) - 1
        hi = int(np.ceil(0.85 * 512)) + 1
        assert all(lo <= n <= hi for n in sizes_r)

    def test_test_pipeline_ignores_range_and_stays_deterministic(self):
        # partial_range is train-only; the deterministic test pipeline
        # keeps the fixed crop (curve comparability across rounds).
        _, test_t = get_transforms(
            "crop", num_points=512, partial_p_keep=[0.7, 0.7],
            predator_compat=False, partial_range=(0.5, 0.85))
        ds = SyntheticShapeDataset({}, n_items=4, n_points=1024,
                                   transform=test_t, seed=1)
        assert ds[2]["src_xyz"].shape[0] == int(np.ceil(0.7 * 512))
        np.testing.assert_array_equal(ds[2]["src_xyz"], ds[2]["src_xyz"])

    def test_overlap_masks_consistent_after_range_crop(self):
        """The recomputed overlap masks/correspondences stay mutually
        consistent under per-sample crops: every correspondence row/col is
        an overlap point and indices are in range."""
        train_rng, _ = get_transforms(
            "crop", num_points=512, partial_p_keep=[0.7, 0.7],
            predator_compat=False, partial_range=(0.5, 0.85))
        ds = SyntheticShapeDataset({}, n_items=6, n_points=1024,
                                   transform=train_rng)
        for i in range(6):
            s = ds[i]
            corr = s["correspondences"]
            assert corr.shape[0] == 2
            assert (corr[0] < s["src_xyz"].shape[0]).all()
            assert (corr[1] < s["tgt_xyz"].shape[0]).all()
            assert s["src_overlap"][corr[0]].all()
            assert s["tgt_overlap"][corr[1]].all()
