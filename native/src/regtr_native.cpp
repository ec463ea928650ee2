// Native host-side preprocessing library.
//
// C++ equivalents of the reference's native layer (/root/reference/src/
// models/backbone_kpconv/cpp_wrappers/: grid_subsampling.cpp, neighbors.cpp)
// plus the open3d-based overlap computation (src/utils/pointcloud.py:8-65).
// Used by the framework as (a) a fast offline data-processing path (overlap
// precompute, neighbor calibration) and (b) an independent oracle for
// validating the JAX device kernels.  The hot inference path is JAX/XLA —
// these are the host/runtime ops.
//
// Design notes (not a port): one regular voxel-hash structure backs all
// three ops (barycenter reduce, fixed-K radius query, mutual-nearest
// overlap) instead of the reference's separate unordered_map subsampler +
// nanoflann KD-tree: bucket grids are cache-friendlier and match the
// device-side algorithm bit-for-bit in structure.
//
// Build: native/build.sh -> libregtr_native.so (plain C ABI, ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline int64_t cell_key(int ix, int iy, int iz) {
  return (static_cast<int64_t>(ix) & 0x1FFFFF) |
         ((static_cast<int64_t>(iy) & 0x1FFFFF) << 21) |
         ((static_cast<int64_t>(iz) & 0x1FFFFF) << 42);
}

// Voxel-bucket acceleration structure over a point set.
class BucketGrid {
 public:
  BucketGrid(const float* pts, int n, float cell) : pts_(pts), cell_(cell) {
    buckets_.reserve(static_cast<size_t>(n));
    for (int i = 0; i < n; ++i) {
      buckets_[key_of(&pts[3 * i])].push_back(i);
    }
  }

  inline int64_t key_of(const float* p) const {
    return cell_key(static_cast<int>(std::floor(p[0] / cell_)),
                    static_cast<int>(std::floor(p[1] / cell_)),
                    static_cast<int>(std::floor(p[2] / cell_)));
  }

  // Visit all points in the 27 cells around p.
  template <typename F>
  void for_candidates(const float* p, F&& f) const {
    const int ix = static_cast<int>(std::floor(p[0] / cell_));
    const int iy = static_cast<int>(std::floor(p[1] / cell_));
    const int iz = static_cast<int>(std::floor(p[2] / cell_));
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = buckets_.find(cell_key(ix + dx, iy + dy, iz + dz));
          if (it == buckets_.end()) continue;
          for (int idx : it->second) f(idx);
        }
  }

 private:
  const float* pts_;
  float cell_;
  std::unordered_map<int64_t, std::vector<int>> buckets_;
};

}  // namespace

extern "C" {

// Voxel-grid barycenter subsample.  Grid origin = floor(min/dl)*dl, matching
// grid_subsampling.cpp:25-27.  Output is sorted by voxel key (deterministic,
// same convention as the device kernel).  Returns number of voxels written
// (<= max_out; excess voxels with the largest keys are dropped).
int rn_grid_subsample(const float* points, int n, float cell,
                      float* out_points, int max_out) {
  if (n <= 0) return 0;
  float mn[3] = {points[0], points[1], points[2]};
  for (int i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], points[3 * i + d]);
  float origin[3];
  for (int d = 0; d < 3; ++d) origin[d] = std::floor(mn[d] / cell) * cell;

  struct Acc {
    double s[3] = {0, 0, 0};
    int count = 0;
  };
  std::unordered_map<int64_t, Acc> acc;
  acc.reserve(static_cast<size_t>(n));
  for (int i = 0; i < n; ++i) {
    const float* p = &points[3 * i];
    int64_t k = cell_key(
        static_cast<int>(std::floor((p[0] - origin[0]) / cell)),
        static_cast<int>(std::floor((p[1] - origin[1]) / cell)),
        static_cast<int>(std::floor((p[2] - origin[2]) / cell)));
    Acc& a = acc[k];
    for (int d = 0; d < 3; ++d) a.s[d] += p[d];
    a.count++;
  }
  std::vector<std::pair<int64_t, Acc>> cells(acc.begin(), acc.end());
  std::sort(cells.begin(), cells.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  int m = std::min<int>(static_cast<int>(cells.size()), max_out);
  for (int i = 0; i < m; ++i) {
    const Acc& a = cells[i].second;
    for (int d = 0; d < 3; ++d)
      out_points[3 * i + d] = static_cast<float>(a.s[d] / a.count);
  }
  return m;
}

// Fixed-K nearest-within-radius neighbor table; shadow index = ns
// (neighbors.cpp:202 convention; nearest-K like the device kernel).
void rn_radius_neighbors(const float* queries, int nq, const float* supports,
                         int ns, float radius, int k, int32_t* out_idx) {
  BucketGrid grid(supports, ns, radius);
  const float r2 = radius * radius;
  std::vector<std::pair<float, int>> cand;
  for (int i = 0; i < nq; ++i) {
    const float* q = &queries[3 * i];
    cand.clear();
    grid.for_candidates(q, [&](int j) {
      const float* s = &supports[3 * j];
      const float dx = q[0] - s[0], dy = q[1] - s[1], dz = q[2] - s[2];
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 <= r2) cand.emplace_back(d2, j);
    });
    const int keep = std::min<int>(k, static_cast<int>(cand.size()));
    std::partial_sort(cand.begin(), cand.begin() + keep, cand.end());
    for (int j = 0; j < keep; ++j) out_idx[i * k + j] = cand[j].second;
    for (int j = keep; j < k; ++j) out_idx[i * k + j] = ns;
  }
}

// Overlap masks + mutual correspondences between an aligned pair.
// src must already be transformed into tgt's frame (pointcloud.py:43-65).
// corr_out must hold 2*min(n_src, n_tgt) ints; returns #correspondences.
int rn_compute_overlap(const float* src, int n_src, const float* tgt,
                       int n_tgt, float radius, uint8_t* src_mask,
                       uint8_t* tgt_mask, int32_t* corr_out) {
  const float r2 = radius * radius;
  std::vector<int32_t> src_nn(n_src, -1), tgt_nn(n_tgt, -1);

  {
    BucketGrid grid(tgt, n_tgt, radius);
    for (int i = 0; i < n_src; ++i) {
      const float* p = &src[3 * i];
      float best = r2;
      int best_j = -1;
      grid.for_candidates(p, [&](int j) {
        const float* t = &tgt[3 * j];
        const float dx = p[0] - t[0], dy = p[1] - t[1], dz = p[2] - t[2];
        const float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 <= best && (best_j < 0 || d2 < best || j < best_j)) {
          best = d2;
          best_j = j;
        }
      });
      src_nn[i] = best_j;
      src_mask[i] = best_j >= 0;
    }
  }
  {
    BucketGrid grid(src, n_src, radius);
    for (int i = 0; i < n_tgt; ++i) {
      const float* p = &tgt[3 * i];
      float best = r2;
      int best_j = -1;
      grid.for_candidates(p, [&](int j) {
        const float* s = &src[3 * j];
        const float dx = p[0] - s[0], dy = p[1] - s[1], dz = p[2] - s[2];
        const float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 <= best && (best_j < 0 || d2 < best || j < best_j)) {
          best = d2;
          best_j = j;
        }
      });
      tgt_nn[i] = best_j;
      tgt_mask[i] = best_j >= 0;
    }
  }
  int n_corr = 0;
  for (int i = 0; i < n_src; ++i) {
    const int j = src_nn[i];
    if (j >= 0 && tgt_nn[j] == i) {
      corr_out[2 * n_corr] = i;
      corr_out[2 * n_corr + 1] = j;
      n_corr++;
    }
  }
  return n_corr;
}

}  // extern "C"
