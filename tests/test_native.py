"""Native C++ library vs numpy oracles (and vs the JAX kernels' contracts)."""
import numpy as np
import pytest

from regtr_tpu import native_bindings as nb

from .oracles import grid_subsample_oracle, knn_radius_oracle

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native library unavailable (no toolchain)"
)


def test_grid_subsample_matches_oracle():
    rng = np.random.RandomState(0)
    pts = rng.rand(3000, 3).astype(np.float32)
    ref = grid_subsample_oracle(pts, 0.07)
    got = nb.grid_subsample(pts, 0.07)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.sort(got, axis=0), np.sort(ref, axis=0), atol=1e-5
    )


def test_radius_neighbors_matches_oracle():
    rng = np.random.RandomState(1)
    q = rng.rand(400, 3).astype(np.float32)
    s = rng.rand(1200, 3).astype(np.float32)
    ref = knn_radius_oracle(q, s, 0.12, 16)
    got = nb.radius_neighbors(q, s, 0.12, 16)
    for i in range(len(q)):
        assert set(got[i][got[i] < 1200]) == set(ref[i][ref[i] < 1200]), i


def test_compute_overlap_matches_scipy():
    from regtr_tpu.data.overlap import compute_overlap as np_overlap

    rng = np.random.RandomState(2)
    src = rng.rand(600, 3).astype(np.float32)
    tgt = src[:500] + rng.randn(500, 3).astype(np.float32) * 0.005
    ref = np_overlap(src, tgt, 0.03)
    got = nb.compute_overlap(src, tgt, 0.03)
    np.testing.assert_array_equal(ref[0], got[0])
    np.testing.assert_array_equal(ref[1], got[1])
    assert ref[2].shape == got[2].shape
