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

// Occupancy + min-label + representative-point build — the native twin
// of mcl_3dl_tpu/map/occupancy.build_occupancy_grid (the reference
// builds per-voxel point lists in raycast_using_dda.h:162-190; here up
// to rep_points stride-sampled representatives per voxel, quantized to
// uint8 cell offsets, exactly like the numpy path so either builder
// yields bit-identical grids).
//
// points: [n, 3] float64 raw coords; labels: [n] uint32 (or null).
// occupied/min_label: [nx*ny*nz], caller-initialized to 0 / 0xFFFFFFFF.
// rep_offsets: [nx*ny*nz * rep_points * 3] uint8, caller-filled 127.
int mcl3dl_build_occupancy_rep(const double* points, const uint32_t* labels,
                               int64_t n, double cell, const double* origin,
                               int64_t nx, int64_t ny, int64_t nz,
                               int32_t rep_points,
                               uint8_t* occupied, uint32_t* min_label,
                               uint8_t* rep_offsets) {
  const Dims dims{nx, ny, nz};
  std::vector<int64_t> flat(n);
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
    flat[i] = flat_index(dims, x, y, z);
  }
  // stable sort by voxel: within a voxel, representatives are picked in
  // original point order (matches numpy argsort(kind="stable"))
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return flat[a] < flat[b]; });

  const int64_t denom = std::max<int64_t>(rep_points - 1, 1);
  for (int64_t s = 0; s < n;) {
    int64_t e = s;
    const int64_t idx = flat[order[s]];
    uint32_t lbl_min = 0xFFFFFFFFu;
    while (e < n && flat[order[e]] == idx) {
      const uint32_t lbl = labels ? labels[order[e]] : 0u;
      lbl_min = std::min(lbl_min, lbl);
      ++e;
    }
    occupied[idx] = 1;
    min_label[idx] = lbl_min;
    const int64_t cnt = e - s;
    const int64_t vz = idx % nz;
    const int64_t vy = (idx / nz) % ny;
    const int64_t vx = idx / (nz * ny);
    const int64_t v[3] = {vx, vy, vz};
    for (int32_t r = 0; r < rep_points; ++r) {
      const int64_t j = order[s + (r * (cnt - 1)) / denom];
      for (int a = 0; a < 3; ++a) {
        const double off =
            points[j * 3 + a] / cell - (origin[a] / cell + v[a]);
        // nearbyint under the default FE_TONEAREST mode = round half
        // to even, matching np.round
        double q = std::nearbyint(off * 255.0);
        q = std::min(std::max(q, 0.0), 255.0);
        rep_offsets[(idx * rep_points + r) * 3 + a] =
            static_cast<uint8_t>(q);
      }
    }
    s = e;
  }
  return 0;
}

}  // extern "C"
