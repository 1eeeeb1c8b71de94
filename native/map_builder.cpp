// Native map compiler: truncated distance-field splat + occupancy build.
//
// Host-side replacement for the hot part of map loading (the reference
// rebuilds per-chunk FLANN kd-trees in ChunkedKdtree::setInputCloud,
// chunked_kdtree.h:124-216; here the map is "compiled" into the dense
// distance field consumed by the TPU kernels).  The Python fallback in
// mcl_3dl_tpu/map/distance_field.py implements the same algorithm with
// numpy; this version is ~10-50x faster on multi-million-point maps and
// is used automatically when the shared library is present (built by
// native/Makefile, loaded via ctypes in mcl_3dl_tpu/map/native.py).
//
// Exact within the truncation radius: every cell receives the true
// minimum distance to any point whose distance is <= trunc.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Dims {
  int64_t nx, ny, nz;
};

inline int64_t flat_index(const Dims& d, int64_t x, int64_t y, int64_t z) {
  return (x * d.ny + y) * d.nz + z;
}

}  // namespace

extern "C" {

// points: [n, 3] float64 ALREADY SCALED into weighted space.
// origin: [3] min corner (weighted space); cell: isotropic cell size.
// field: [nx*ny*nz] float32, pre-filled with trunc by the caller.
// Returns 0 on success.
int mcl3dl_build_distance_field(const double* points, int64_t n,
                                double cell, double trunc,
                                const double* origin,
                                int64_t nx, int64_t ny, int64_t nz,
                                float* field, int n_threads) {
  const Dims dims{nx, ny, nz};
  const int64_t r = static_cast<int64_t>(std::ceil(trunc / cell + 0.5));
  const double trunc2 = trunc * trunc;

  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }

  // Shard the grid by x-slabs so threads never write the same cell.
  auto worker = [&](int tid) {
    const int64_t x_lo = nx * tid / n_threads;
    const int64_t x_hi = nx * (tid + 1) / n_threads;
    for (int64_t i = 0; i < n; ++i) {
      const double px = points[i * 3 + 0];
      const double py = points[i * 3 + 1];
      const double pz = points[i * 3 + 2];
      const int64_t bx = static_cast<int64_t>(
          std::llround((px - origin[0]) / cell));
      const int64_t by = static_cast<int64_t>(
          std::llround((py - origin[1]) / cell));
      const int64_t bz = static_cast<int64_t>(
          std::llround((pz - origin[2]) / cell));
      const int64_t x0 = std::max(bx - r, x_lo);
      const int64_t x1 = std::min(bx + r, x_hi - 1);
      if (x0 > x1) continue;
      const int64_t y0 = std::max<int64_t>(by - r, 0);
      const int64_t y1 = std::min(by + r, ny - 1);
      const int64_t z0 = std::max<int64_t>(bz - r, 0);
      const int64_t z1 = std::min(bz + r, nz - 1);
      for (int64_t x = x0; x <= x1; ++x) {
        const double dx = origin[0] + x * cell - px;
        const double dx2 = dx * dx;
        if (dx2 >= trunc2) continue;
        for (int64_t y = y0; y <= y1; ++y) {
          const double dy = origin[1] + y * cell - py;
          const double dxy2 = dx2 + dy * dy;
          if (dxy2 >= trunc2) continue;
          float* row = field + flat_index(dims, x, y, z0);
          for (int64_t z = z0; z <= z1; ++z) {
            const double dz = origin[2] + z * cell - pz;
            const double d2 = dxy2 + dz * dz;
            if (d2 < trunc2) {
              const float d = static_cast<float>(std::sqrt(d2));
              float& cellv = row[z - z0];
              if (d < cellv) cellv = d;
            }
          }
        }
      }
    }
  };

  if (n_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
  }
  return 0;
}

// Occupancy + min-label + mean-point build (raycast_using_dda.h:162-190
// equivalent).  points: [n, 3] float64 raw coords; labels: [n] uint32.
int mcl3dl_build_occupancy(const double* points, const uint32_t* labels,
                           int64_t n, double cell, const double* origin,
                           int64_t nx, int64_t ny, int64_t nz,
                           uint8_t* occupied, uint32_t* min_label,
                           float* sum_xyz, int32_t* count) {
  const Dims dims{nx, ny, nz};
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = static_cast<int64_t>(
        std::floor((points[i * 3 + 0] - origin[0]) / cell));
    int64_t y = static_cast<int64_t>(
        std::floor((points[i * 3 + 1] - origin[1]) / cell));
    int64_t z = static_cast<int64_t>(
        std::floor((points[i * 3 + 2] - origin[2]) / cell));
    x = std::min(std::max<int64_t>(x, 0), nx - 1);
    y = std::min(std::max<int64_t>(y, 0), ny - 1);
    z = std::min(std::max<int64_t>(z, 0), nz - 1);
    const int64_t idx = flat_index(dims, x, y, z);
    occupied[idx] = 1;
    const uint32_t lbl = labels ? labels[i] : 0u;
    if (lbl < min_label[idx]) min_label[idx] = lbl;
    sum_xyz[idx * 3 + 0] += static_cast<float>(points[i * 3 + 0]);
    sum_xyz[idx * 3 + 1] += static_cast<float>(points[i * 3 + 1]);
    sum_xyz[idx * 3 + 2] += static_cast<float>(points[i * 3 + 2]);
    count[idx] += 1;
  }
  return 0;
}

}  // extern "C"
