// Native host-side data-path kernels for quantv2x_tpu.
//
// The reference framework keeps its host data path native (spconv's C++
// Point2VoxelCPU3d voxelizer + Cython bbox_overlaps running in dataloader
// workers, see SURVEY.md §2.7). Our device-side jnp voxelizer covers the
// TPU path; this library covers the host path: fast .bin decode with
// NaN-scrub + range filter, a reference-exact CPU voxelizer (used for
// CPU-only tools and as an independent oracle for the device voxelizer),
// and the anchor-vs-GT standup IoU matrix used by host-side label checks.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Read float32 Nx4 .bin lidar, drop NaN rows and rows outside the range.
// Returns number of points written to out (caller allocates max_points*4).
int64_t qv2x_load_bin(const char* path, float* out, int64_t max_points,
                      const float* range /* x1 y1 z1 x2 y2 z2 or null */) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t n = bytes / (4 * sizeof(float));
  std::vector<float> buf(static_cast<size_t>(n) * 4);
  const size_t got = std::fread(buf.data(), sizeof(float), buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;

  int64_t k = 0;
  for (int64_t i = 0; i < n && k < max_points; ++i) {
    const float* p = &buf[i * 4];
    if (std::isnan(p[0]) || std::isnan(p[1]) || std::isnan(p[2])) continue;
    if (range) {
      if (p[0] < range[0] || p[0] >= range[3] || p[1] < range[1] ||
          p[1] >= range[4] || p[2] < range[2] || p[2] >= range[5])
        continue;
    }
    std::memcpy(&out[k * 4], p, 4 * sizeof(float));
    ++k;
  }
  return k;
}

// Reference-style CPU pillar voxelizer: first-come pillar order, per-pillar
// point cap, pillar cap. Coordinates emitted as (z=0, y, x) like the
// reference preprocessor. Returns number of pillars.
int64_t qv2x_voxelize(const float* points, int64_t n_points,
                      const float* range,   // x1 y1 z1 x2 y2 z2
                      const float* voxel,   // vx vy vz
                      int32_t max_points_per_voxel, int32_t max_voxels,
                      float* voxel_features,   // (max_voxels, mppv, 4)
                      int32_t* voxel_coords,   // (max_voxels, 3)
                      int32_t* voxel_num) {    // (max_voxels,)
  const int nx = static_cast<int>(std::round((range[3] - range[0]) / voxel[0]));
  const int ny = static_cast<int>(std::round((range[4] - range[1]) / voxel[1]));
  std::unordered_map<int64_t, int32_t> slot_of;
  slot_of.reserve(static_cast<size_t>(max_voxels) * 2);
  std::memset(voxel_features, 0,
              sizeof(float) * max_voxels * max_points_per_voxel * 4);
  std::memset(voxel_num, 0, sizeof(int32_t) * max_voxels);
  int32_t n_voxels = 0;

  for (int64_t i = 0; i < n_points; ++i) {
    const float* p = &points[i * 4];
    if (p[0] < range[0] || p[0] >= range[3] || p[1] < range[1] ||
        p[1] >= range[4] || p[2] < range[2] || p[2] >= range[5])
      continue;
    const int gx = std::min(static_cast<int>((p[0] - range[0]) / voxel[0]), nx - 1);
    const int gy = std::min(static_cast<int>((p[1] - range[1]) / voxel[1]), ny - 1);
    const int64_t key = static_cast<int64_t>(gy) * nx + gx;
    auto it = slot_of.find(key);
    int32_t slot;
    if (it == slot_of.end()) {
      if (n_voxels >= max_voxels) continue;
      slot = n_voxels++;
      slot_of.emplace(key, slot);
      voxel_coords[slot * 3 + 0] = 0;
      voxel_coords[slot * 3 + 1] = gy;
      voxel_coords[slot * 3 + 2] = gx;
    } else {
      slot = it->second;
    }
    const int32_t cnt = voxel_num[slot];
    if (cnt >= max_points_per_voxel) continue;
    std::memcpy(&voxel_features[(static_cast<int64_t>(slot) *
                                 max_points_per_voxel + cnt) * 4],
                p, 4 * sizeof(float));
    voxel_num[slot] = cnt + 1;
  }
  return n_voxels;
}

// Axis-aligned IoU matrix between standup boxes (N,4) x (M,4) -> (N,M).
void qv2x_iou_matrix(const float* a, int64_t n, const float* b, int64_t m,
                     float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float ax1 = a[i * 4], ay1 = a[i * 4 + 1];
    const float ax2 = a[i * 4 + 2], ay2 = a[i * 4 + 3];
    const float area_a = (ax2 - ax1) * (ay2 - ay1);
    for (int64_t j = 0; j < m; ++j) {
      const float bx1 = b[j * 4], by1 = b[j * 4 + 1];
      const float bx2 = b[j * 4 + 2], by2 = b[j * 4 + 3];
      const float iw = std::max(0.f, std::min(ax2, bx2) - std::max(ax1, bx1));
      const float ih = std::max(0.f, std::min(ay2, by2) - std::max(ay1, by1));
      const float inter = iw * ih;
      const float uni = area_a + (bx2 - bx1) * (by2 - by1) - inter;
      out[i * m + j] = uni > 0.f ? inter / uni : 0.f;
    }
  }
}

}  // extern "C"
