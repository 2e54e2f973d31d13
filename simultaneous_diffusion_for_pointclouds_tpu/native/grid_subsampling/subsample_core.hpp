// Voxel-grid point-cloud subsampling core.
//
// Re-implementation of the reference CPython extension's behaviour
// (reference datasets/cpp_wrappers/cpp_subsampling/grid_subsampling/
// grid_subsampling.{h,cpp} and grid_subsampling_lidar.{h,cpp}), written
// fresh for this framework: flat float arrays instead of a PointXYZ class,
// one templated accumulator covering both the barycenter and the
// "lidar" best-aligned-point policies.
//
// Semantics preserved:
//  - voxel key = iX + NX*iY + NX*NY*iZ over a grid anchored at
//    floor(min/dl)*dl
//  - barycenter mode: per-voxel mean of points and features; per-voxel
//    majority vote per label column
//  - lidar mode: per-voxel keep the single point whose last two feature
//    columns (gridX, gridY) have the deepest run of nonzero remainders
//    against powers of two (m = 1..16, stop at first failure); no
//    averaging
#pragma once

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace sdpc {

struct VoxelAccum {
  double sum[3] = {0.0, 0.0, 0.0};
  int count = 0;
  int best_alignment = -1;  // lidar mode: best power-of-two depth seen
  std::vector<double> feat_sum;
  // per label column: value -> occurrences (small maps; labels are ints)
  std::vector<std::unordered_map<int, int>> label_votes;
};

inline int pow2_alignment(float gx, float gy) {
  // depth of the run of m where (int)gx % 2^m != 0 and (int)gy % 2^m != 0
  int ix = (int)gx, iy = (int)gy;
  int best = 0;
  for (int m = 1; m < 17; ++m) {
    int mod = 1 << m;
    if ((ix % mod) && (iy % mod))
      best = m;
    else
      break;
  }
  return best;
}

// points: N*3 floats; features: N*fdim (or null); labels: N*ldim (or null).
// Appends results to the out_* vectors. Returns number of voxels emitted.
inline size_t grid_subsample(const float* points, size_t n,
                             const float* features, size_t fdim,
                             const int* labels, size_t ldim,
                             float voxel, bool lidar_mode,
                             std::vector<float>& out_points,
                             std::vector<float>& out_features,
                             std::vector<int>& out_labels) {
  if (n == 0) return 0;

  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (size_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = points[3 * i + d];
      if (v < lo[d]) lo[d] = v;
      if (v > hi[d]) hi[d] = v;
    }
  }
  double origin[3];
  for (int d = 0; d < 3; ++d)
    origin[d] = std::floor(lo[d] / voxel) * voxel;
  const size_t nx = (size_t)std::floor((hi[0] - origin[0]) / voxel) + 1;
  const size_t ny = (size_t)std::floor((hi[1] - origin[1]) / voxel) + 1;

  std::unordered_map<size_t, VoxelAccum> voxels;
  voxels.reserve(n / 4);

  for (size_t i = 0; i < n; ++i) {
    const float* p = points + 3 * i;
    size_t ix = (size_t)std::floor((p[0] - origin[0]) / voxel);
    size_t iy = (size_t)std::floor((p[1] - origin[1]) / voxel);
    size_t iz = (size_t)std::floor((p[2] - origin[2]) / voxel);
    size_t key = ix + nx * iy + nx * ny * iz;

    VoxelAccum& acc = voxels[key];
    if (acc.feat_sum.empty() && fdim) acc.feat_sum.resize(fdim, 0.0);
    if (acc.label_votes.empty() && ldim) acc.label_votes.resize(ldim);

    if (lidar_mode && features) {
      // keep only the best-aligned point per voxel
      float gx = features[fdim * i + fdim - 2];
      float gy = features[fdim * i + fdim - 1];
      int align = pow2_alignment(gx, gy);
      if (align <= acc.best_alignment) continue;
      acc.best_alignment = align;
      acc.count = 1;
      for (int d = 0; d < 3; ++d) acc.sum[d] = p[d];
      for (size_t f = 0; f < fdim; ++f) acc.feat_sum[f] = features[fdim * i + f];
      for (size_t l = 0; l < ldim; ++l) {
        acc.label_votes[l].clear();
        acc.label_votes[l][labels[ldim * i + l]] = 1;
      }
    } else {
      acc.count += 1;
      for (int d = 0; d < 3; ++d) acc.sum[d] += p[d];
      for (size_t f = 0; f < fdim; ++f) acc.feat_sum[f] += features[fdim * i + f];
      for (size_t l = 0; l < ldim; ++l) acc.label_votes[l][labels[ldim * i + l]] += 1;
    }
  }

  out_points.reserve(out_points.size() + voxels.size() * 3);
  for (auto& kv : voxels) {
    VoxelAccum& acc = kv.second;
    double inv = lidar_mode ? 1.0 : 1.0 / acc.count;
    for (int d = 0; d < 3; ++d)
      out_points.push_back((float)(acc.sum[d] * inv));
    for (size_t f = 0; f < fdim; ++f)
      out_features.push_back((float)(acc.feat_sum[f] * inv));
    for (size_t l = 0; l < ldim; ++l) {
      int best_val = 0, best_n = -1;
      for (auto& vote : acc.label_votes[l]) {
        if (vote.second > best_n) {
          best_n = vote.second;
          best_val = vote.first;
        }
      }
      out_labels.push_back(best_val);
    }
  }
  return voxels.size();
}

}  // namespace sdpc
