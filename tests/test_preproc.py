"""Tests for the deterministic device-side preprocessing pyramid."""
import numpy as np
import jax.numpy as jnp
import pytest

from regtr_tpu.ops.subsample import grid_subsample, grid_subsample_batch
from regtr_tpu.ops.neighbors import radius_neighbors, radius_neighbors_batch
from regtr_tpu.ops import pyramid as pyr

from .oracles import grid_subsample_oracle, knn_radius_oracle


def make_cloud(rng, n, scale=1.0):
    return (rng.rand(n, 3).astype(np.float32) - 0.5) * scale


class TestGridSubsample:
    @pytest.mark.parametrize("n,dl", [(200, 0.1), (1000, 0.06), (50, 0.3)])
    def test_matches_oracle(self, n, dl):
        rng = np.random.RandomState(42)
        pts = make_cloud(rng, n)
        ref = grid_subsample_oracle(pts, dl)
        sub, mask, nvox = grid_subsample(
            jnp.asarray(pts), jnp.ones(n, bool), dl, capacity=n
        )
        got = np.asarray(sub)[np.asarray(mask)]
        assert got.shape == ref.shape
        assert int(nvox) == len(ref)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_masked_points_excluded(self):
        rng = np.random.RandomState(0)
        pts = make_cloud(rng, 100)
        mask = np.ones(100, bool)
        mask[60:] = False
        ref = grid_subsample_oracle(pts[:60], 0.15)
        sub, smask, _ = grid_subsample(
            jnp.asarray(pts), jnp.asarray(mask), 0.15, capacity=100
        )
        got = np.asarray(sub)[np.asarray(smask)]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_deterministic_under_permutation(self):
        """Same point set in any order -> identical output (the reference's
        GPU path explicitly fails this; determinism is a design goal)."""
        rng = np.random.RandomState(1)
        pts = make_cloud(rng, 300)
        perm = rng.permutation(300)
        a = grid_subsample(jnp.asarray(pts), jnp.ones(300, bool), 0.1, capacity=300)
        b = grid_subsample(
            jnp.asarray(pts[perm]), jnp.ones(300, bool), 0.1, capacity=300
        )
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)

    def test_batch(self):
        rng = np.random.RandomState(2)
        pts = np.stack([make_cloud(rng, 128) for _ in range(4)])
        mask = np.ones((4, 128), bool)
        sub, smask, nvox = grid_subsample_batch(
            jnp.asarray(pts), jnp.asarray(mask), 0.2, 128
        )
        for b in range(4):
            ref = grid_subsample_oracle(pts[b], 0.2)
            got = np.asarray(sub[b])[np.asarray(smask[b])]
            np.testing.assert_allclose(got, ref, atol=1e-5)


class TestRadiusNeighbors:
    @pytest.mark.parametrize("nq,ns,k,chunk", [(100, 100, 10, 32), (64, 256, 20, 1024)])
    def test_matches_oracle(self, nq, ns, k, chunk):
        rng = np.random.RandomState(3)
        q = make_cloud(rng, nq)
        s = make_cloud(rng, ns)
        radius = 0.25
        idx = np.asarray(
            radius_neighbors(
                jnp.asarray(q), jnp.ones(nq, bool),
                jnp.asarray(s), jnp.ones(ns, bool),
                radius, k=k, chunk=chunk,
            )
        )
        ref = knn_radius_oracle(q, s, radius, k)
        # Sets of valid neighbors must agree (order may differ on ties).
        for i in range(nq):
            got_set = set(idx[i][idx[i] < ns].tolist())
            ref_set = set(ref[i][ref[i] < ns].tolist())
            assert got_set == ref_set, f"row {i}"

    def test_shadow_for_far_and_invalid(self):
        q = jnp.asarray([[0.0, 0, 0], [5.0, 5, 5]])
        s = jnp.asarray([[0.01, 0, 0], [100.0, 0, 0]])
        idx = radius_neighbors(
            q, jnp.asarray([True, False]), s, jnp.asarray([True, True]),
            0.5, k=4,
        )
        idx = np.asarray(idx)
        assert idx[0, 0] == 0          # in-radius support found
        assert np.all(idx[0, 1:] == 2)  # rest shadow
        assert np.all(idx[1] == 2)      # invalid query -> all shadow

    def test_invalid_supports_never_returned(self):
        rng = np.random.RandomState(4)
        q = make_cloud(rng, 32)
        s = np.concatenate([q, np.zeros((8, 3), np.float32)])
        s_mask = np.ones(40, bool)
        s_mask[32:] = False
        idx = np.asarray(
            radius_neighbors(
                jnp.asarray(q), jnp.ones(32, bool),
                jnp.asarray(s), jnp.asarray(s_mask), 1.0, k=40,
            )
        )
        valid = idx[idx < 40]
        assert np.all(valid < 32)


class TestPyramid:
    def _cfg(self):
        return {
            "architecture": ["simple", "resnetb", "resnetb_strided", "resnetb",
                             "resnetb_strided", "resnetb"],
            "first_subsampling_dl": 0.06,
            "conv_radius": 2.5,
            "neighborhood_limits": [16, 16, 16],
            "capacity_factor": 0.6,
        }

    def test_spec(self):
        spec = pyr.make_pyramid_spec(self._cfg(), 256)
        assert spec.num_levels == 3
        np.testing.assert_allclose(spec.radii, [0.15, 0.3, 0.6])
        np.testing.assert_allclose(spec.voxel_sizes, [0.06, 0.12, 0.24])
        assert spec.capacities[0] == 256

    def test_build_and_overlap_propagation(self):
        rng = np.random.RandomState(5)
        spec = pyr.make_pyramid_spec(self._cfg(), 256)
        pts = np.stack([make_cloud(rng, 256) for _ in range(2)])
        mask = np.ones((2, 256), bool)
        mask[1, 200:] = False
        levels = pyr.build_pyramid(jnp.asarray(pts), jnp.asarray(mask), spec)
        assert len(levels) == 3
        # level shapes follow the spec
        for li, lvl in enumerate(levels):
            assert lvl.points.shape[1] == spec.capacities[li]
            assert lvl.neighbors.shape[-1] == spec.neighbor_ks[li]
        # subsampled points of cloud 1 never come from masked region
        for lvl in levels[1:]:
            sub_valid = np.asarray(lvl.points[1])[np.asarray(lvl.mask[1])]
            assert len(sub_valid) > 0

        # overlap propagation: constant overlap stays constant
        ov0 = jnp.where(jnp.asarray(mask), 1.0, 0.0)
        ovs = pyr.compute_overlap_pyramid(ov0, levels)
        for li, ov in enumerate(ovs):
            valid = np.asarray(levels[li].mask)
            vals = np.asarray(ov)[valid]
            np.testing.assert_allclose(vals, 1.0, atol=1e-6)

    def test_jit_compiles_once(self):
        import jax
        spec = pyr.make_pyramid_spec(self._cfg(), 128)
        rng = np.random.RandomState(6)

        @jax.jit
        def run(pts, mask):
            levels = pyr.build_pyramid(pts, mask, spec)
            return levels[-1].points

        pts = jnp.asarray(np.stack([make_cloud(rng, 128) for _ in range(2)]))
        out = run(pts, jnp.ones((2, 128), bool))
        assert np.all(np.isfinite(np.asarray(out)))


class TestGridNeighbors:
    """The grid-bucket fast path must agree with the streaming-scan oracle."""

    @pytest.mark.parametrize("nq,ns,k", [(200, 200, 12), (128, 400, 24)])
    def test_matches_scan(self, nq, ns, k):
        from regtr_tpu.ops.neighbors import grid_radius_neighbors

        rng = np.random.RandomState(7)
        q = make_cloud(rng, nq)
        s = make_cloud(rng, ns)
        radius = 0.2
        scan = np.asarray(radius_neighbors(
            jnp.asarray(q), jnp.ones(nq, bool),
            jnp.asarray(s), jnp.ones(ns, bool), radius, k=k,
        ))
        grid = np.asarray(grid_radius_neighbors(
            jnp.asarray(q), jnp.ones(nq, bool),
            jnp.asarray(s), jnp.ones(ns, bool),
            jnp.float32(radius), k=k, cell_cap=64,
        ))
        for i in range(nq):
            assert set(grid[i][grid[i] < ns].tolist()) == \
                set(scan[i][scan[i] < ns].tolist()), f"row {i}"

    def test_masked_and_real_scan(self):
        """Real 3DMatch scan fragment: grid must match scan with masking."""
        from regtr_tpu.ops.neighbors import grid_radius_neighbors
        import torch

        cloud = np.asarray(torch.load(
            "/root/reference/data/indoor/test/7-scenes-redkitchen/cloud_bin_0.pth",
            weights_only=False), np.float32)[:1500]
        n = 1600
        pts = np.zeros((n, 3), np.float32)
        pts[:1500] = cloud
        mask = np.zeros(n, bool)
        mask[:1500] = True
        radius, k = 0.0625, 40
        scan = np.asarray(radius_neighbors(
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray(pts), jnp.asarray(mask), radius, k=k,
        ))
        grid = np.asarray(grid_radius_neighbors(
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.float32(radius), k=k, cell_cap=64,
        ))
        mismatch = 0
        for i in range(n):
            gs = set(grid[i][grid[i] < n].tolist())
            ss = set(scan[i][scan[i] < n].tolist())
            if gs == ss:
                continue
            # Distance ties at the K-th-neighbor boundary may resolve to
            # either candidate; allow the difference iff all disagreeing
            # points sit at (numerically) the same distance.
            diff = gs ^ ss
            dists = [np.linalg.norm(pts[i] - pts[j]) for j in diff]
            if len(gs) == len(ss) and np.ptp(dists) < 1e-5:
                continue
            mismatch += 1
        assert mismatch == 0, f"{mismatch} rows disagree"


class TestBruteNeighbors:
    """Brute+approx fast path: all results in-radius; >=95% recall vs oracle."""

    def test_contract_and_recall(self):
        from regtr_tpu.ops.neighbors import brute_radius_neighbors

        rng = np.random.RandomState(11)
        n = 2048
        pts = make_cloud(rng, n)
        mask = np.ones(n, bool)
        mask[2000:] = False
        radius, k = 0.1, 24
        got = np.asarray(brute_radius_neighbors(
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.float32(radius), k=k, query_chunk=512,
        ))
        ref = np.asarray(radius_neighbors(
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray(pts), jnp.asarray(mask), radius, k=k,
        ))
        total_ref = total_hit = 0
        for i in range(n):
            gset = set(got[i][got[i] < n].tolist())
            rset = set(ref[i][ref[i] < n].tolist())
            # contract: every returned neighbor is valid and within radius
            # (+0.4% margin: the partial reduction runs on bf16 distances)
            for j in gset:
                assert mask[j]
                assert np.linalg.norm(pts[i] - pts[j]) <= radius * 1.004
            total_ref += len(rset)
            total_hit += len(gset & rset)
        assert total_hit / max(total_ref, 1) > 0.95, total_hit / total_ref

    def test_invalid_query_all_shadow(self):
        from regtr_tpu.ops.neighbors import brute_radius_neighbors

        rng = np.random.RandomState(12)
        pts = make_cloud(rng, 64)
        qm = np.zeros(64, bool)
        got = np.asarray(brute_radius_neighbors(
            jnp.asarray(pts), jnp.asarray(qm),
            jnp.asarray(pts), jnp.ones(64, bool),
            jnp.float32(0.5), k=8,
        ))
        assert np.all(got == 64)
