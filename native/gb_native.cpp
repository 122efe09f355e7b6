// Native host-side kernels for the data pipeline.
//
// The reference keeps its performance-critical ops in CUDA extensions; on
// TPU the device compute path is XLA/Pallas, and the host data pipeline
// (depth back-projection, FPS index precompute, label visibility checks)
// is the part that benefits from native code. Exposed via a plain C ABI
// and loaded with ctypes (graspbalance_tpu/data/native.py); every entry
// point has a numpy fallback + oracle test.
//
// Build: `make -C native` (produces libgb_native.so).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Greedy furthest point sampling, reference variant-A semantics
// (idx[0]=0, skip points with |p|^2 <= 1e-3 when skip_origin, max-min on
// squared distance, running buffer init 1e10, first-max tie break).
void gb_fps(const float* pts, int64_t n, int64_t m, int skip_origin,
            int32_t* out) {
  if (m <= 0) return;
  std::vector<float> dist(n, 1e10f);
  std::vector<uint8_t> valid(n, 1);
  if (skip_origin) {
    for (int64_t i = 0; i < n; ++i) {
      const float* p = pts + 3 * i;
      valid[i] = (p[0] * p[0] + p[1] * p[1] + p[2] * p[2]) > 1e-3f;
    }
  }
  out[0] = 0;
  int64_t last = 0;
  for (int64_t j = 1; j < m; ++j) {
    const float lx = pts[3 * last], ly = pts[3 * last + 1],
                lz = pts[3 * last + 2];
    float best = -1.0f;
    int64_t besti = 0;
    for (int64_t k = 0; k < n; ++k) {
      const float dx = pts[3 * k] - lx;
      const float dy = pts[3 * k + 1] - ly;
      const float dz = pts[3 * k + 2] - lz;
      float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[k]) dist[k] = d;
      const float cand = valid[k] ? dist[k] : -1.0f;
      if (cand > best) {
        best = cand;
        besti = k;
      }
    }
    out[j] = static_cast<int32_t>(besti);
    last = besti;
  }
}

// Pinhole back-projection: depth (h, w) uint16 -> cloud (h*w, 3) f32.
void gb_depth_to_cloud(const uint16_t* depth, int64_t h, int64_t w, float fx,
                       float fy, float cx, float cy, float scale,
                       float* cloud) {
  for (int64_t v = 0; v < h; ++v) {
    for (int64_t u = 0; u < w; ++u) {
      const float z = static_cast<float>(depth[v * w + u]) / scale;
      float* o = cloud + 3 * (v * w + u);
      o[0] = (static_cast<float>(u) - cx) * z / fx;
      o[1] = (static_cast<float>(v) - cy) * z / fy;
      o[2] = z;
    }
  }
}

// Visibility mask: out[i] = 1 iff min_j |pose(gp_i) - cloud_j| < th.
// Early-exits on the first point within range (data_utils.py:48-53 is a
// full (Np, Nc) numpy distance matrix).
void gb_visibility_mask(const float* cloud, int64_t nc, const float* gp,
                        int64_t ng, const float* pose /* 3x4 row-major */,
                        float th, uint8_t* out) {
  const float th2 = th * th;
  for (int64_t i = 0; i < ng; ++i) {
    const float* p = gp + 3 * i;
    const float x =
        pose[0] * p[0] + pose[1] * p[1] + pose[2] * p[2] + pose[3];
    const float y =
        pose[4] * p[0] + pose[5] * p[1] + pose[6] * p[2] + pose[7];
    const float z =
        pose[8] * p[0] + pose[9] * p[1] + pose[10] * p[2] + pose[11];
    uint8_t vis = 0;
    for (int64_t j = 0; j < nc; ++j) {
      const float dx = cloud[3 * j] - x;
      const float dy = cloud[3 * j + 1] - y;
      const float dz = cloud[3 * j + 2] - z;
      if (dx * dx + dy * dy + dz * dz < th2) {
        vis = 1;
        break;
      }
    }
    out[i] = vis;
  }
}

// Centroid voxel downsample. Returns the number of occupied voxels; centroids
// written to `out` (capacity n). Order: first-occurrence of each voxel.
int64_t gb_voxel_downsample(const float* pts, int64_t n, float voxel,
                            float* out) {
  struct Cell {
    int64_t key;
    double sx, sy, sz;
    int64_t cnt;
  };
  // open-address hash table, 2x capacity
  int64_t cap = 1;
  while (cap < 2 * n) cap <<= 1;
  std::vector<int64_t> keys(cap, -1);
  std::vector<int64_t> slot_of(cap, -1);
  std::vector<Cell> cells;
  cells.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t gx = static_cast<int64_t>(std::floor(pts[3 * i] / voxel));
    const int64_t gy =
        static_cast<int64_t>(std::floor(pts[3 * i + 1] / voxel));
    const int64_t gz =
        static_cast<int64_t>(std::floor(pts[3 * i + 2] / voxel));
    const int64_t key =
        (gx * 73856093LL) ^ (gy * 19349663LL) ^ (gz * 83492791LL);
    const int64_t full = gx * 4000037LL + gy * 2003LL + gz;  // verify key
    int64_t h = key & (cap - 1);
    while (true) {
      if (keys[h] == -1) {
        keys[h] = full;
        slot_of[h] = static_cast<int64_t>(cells.size());
        cells.push_back({full, pts[3 * i], pts[3 * i + 1], pts[3 * i + 2], 1});
        break;
      }
      if (keys[h] == full) {
        Cell& c = cells[slot_of[h]];
        c.sx += pts[3 * i];
        c.sy += pts[3 * i + 1];
        c.sz += pts[3 * i + 2];
        c.cnt += 1;
        break;
      }
      h = (h + 1) & (cap - 1);
    }
  }
  for (size_t i = 0; i < cells.size(); ++i) {
    out[3 * i] = static_cast<float>(cells[i].sx / cells[i].cnt);
    out[3 * i + 1] = static_cast<float>(cells[i].sy / cells[i].cnt);
    out[3 * i + 2] = static_cast<float>(cells[i].sz / cells[i].cnt);
  }
  return static_cast<int64_t>(cells.size());
}

}  // extern "C"
