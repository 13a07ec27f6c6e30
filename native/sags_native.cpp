// sags_native — host-side runtime kernels for the ingestion path.
//
// The reference's host runtime leans on native code: PCL's VoxelGrid
// (`pygicp.downsample`, fast_gicp `src/python/main.cpp:292-299`), nanoflann/
// pcl kd-trees for covariance kNN (`fast_gicp_impl.hpp:380-479`), and a
// structured-numpy PointCloud2 parse (`scripts/gaussian_splatting.py:105-134`).
// This library provides the same primitives for the TPU stack's host side:
// the TPU does the math; the CPU feeds it. Exposed via ctypes (no pybind11
// in this image).
//
// Build: make -C native   (produces libsags_native.so)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Voxel-grid centroid downsample (PCL VoxelGrid semantics).
// Returns number of output points written to out (capacity max_out).
// ---------------------------------------------------------------------------
int sags_voxel_downsample(const float* pts, int n, float resolution,
                          float* out, int max_out) {
  // Key on the exact (cx,cy,cz) triple; the spatial-hash primes are only the
  // HASHER (as in fast_gicp/PCL), so colliding cells are resolved by equality
  // instead of silently merged.
  struct Key {
    int64_t cx, cy, cz;
    bool operator==(const Key& o) const {
      return cx == o.cx && cy == o.cy && cz == o.cz;
    }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return (size_t)((k.cx * 73856093LL) ^ (k.cy * 19349669LL) ^
                      (k.cz * 83492791LL));
    }
  };
  std::unordered_map<Key, std::pair<int, std::array<double, 3>>, KeyHash> cells;
  cells.reserve(n);
  const double inv = 1.0 / resolution;
  for (int i = 0; i < n; i++) {
    const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const int64_t cx = (int64_t)std::floor(x * inv);
    const int64_t cy = (int64_t)std::floor(y * inv);
    const int64_t cz = (int64_t)std::floor(z * inv);
    Key k{cx, cy, cz};
    auto& cell = cells[k];
    cell.first++;
    cell.second[0] += x;
    cell.second[1] += y;
    cell.second[2] += z;
  }
  int m = 0;
  for (const auto& kv : cells) {
    if (m >= max_out) break;
    const auto& c = kv.second;
    out[3 * m] = (float)(c.second[0] / c.first);
    out[3 * m + 1] = (float)(c.second[1] / c.first);
    out[3 * m + 2] = (float)(c.second[2] / c.first);
    m++;
  }
  return m;
}

// ---------------------------------------------------------------------------
// kd-tree kNN (build + batch query). Simple median-split kd-tree — the same
// O(log n) structure pcl::search::KdTree provides for the covariance loop.
// ---------------------------------------------------------------------------
namespace {
struct KDTree {
  // nodes laid out in an implicit array; leaves hold point ranges
  std::vector<int> idx;          // permutation of point indices
  std::vector<float> pts;        // copied points [n*3]
  struct Node {
    float split;
    int axis;      // -1 for leaf
    int begin, end;  // leaf range in idx
    int left, right;
  };
  std::vector<Node> nodes;

  int build(int begin, int end, int depth) {
    Node nd;
    if (end - begin <= 16) {
      nd.axis = -1;
      nd.begin = begin;
      nd.end = end;
      nd.left = nd.right = -1;
      nodes.push_back(nd);
      return (int)nodes.size() - 1;
    }
    int axis = depth % 3;
    int mid = (begin + end) / 2;
    std::nth_element(idx.begin() + begin, idx.begin() + mid, idx.begin() + end,
                     [&](int a, int b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    nd.axis = axis;
    nd.split = pts[3 * idx[mid] + axis];
    nd.begin = begin;
    nd.end = end;
    int me = (int)nodes.size();
    nodes.push_back(nd);
    int l = build(begin, mid, depth + 1);
    int r = build(mid, end, depth + 1);
    nodes[me].left = l;
    nodes[me].right = r;
    return me;
  }

  void knn(const float* q, int k, int* out_idx, float* out_d2) const {
    // max-heap of (d2, idx)
    std::priority_queue<std::pair<float, int>> heap;
    search(0, q, k, heap);
    int m = (int)heap.size();
    for (int i = m - 1; i >= 0; i--) {
      out_d2[i] = heap.top().first;
      out_idx[i] = heap.top().second;
      heap.pop();
    }
    for (int i = m; i < k; i++) {
      out_idx[i] = -1;
      out_d2[i] = INFINITY;
    }
  }

  void search(int ni, const float* q, int k,
              std::priority_queue<std::pair<float, int>>& heap) const {
    const Node& nd = nodes[ni];
    if (nd.axis < 0) {
      for (int i = nd.begin; i < nd.end; i++) {
        int p = idx[i];
        float dx = pts[3 * p] - q[0], dy = pts[3 * p + 1] - q[1],
              dz = pts[3 * p + 2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if ((int)heap.size() < k)
          heap.emplace(d2, p);
        else if (d2 < heap.top().first) {
          heap.pop();
          heap.emplace(d2, p);
        }
      }
      return;
    }
    float diff = q[nd.axis] - nd.split;
    int near = diff <= 0 ? nd.left : nd.right;
    int far = diff <= 0 ? nd.right : nd.left;
    search(near, q, k, heap);
    if ((int)heap.size() < k || diff * diff < heap.top().first)
      search(far, q, k, heap);
  }
};
}  // namespace

void* sags_kdtree_build(const float* pts, int n) {
  auto* t = new KDTree();
  t->pts.assign(pts, pts + 3 * n);
  t->idx.resize(n);
  std::iota(t->idx.begin(), t->idx.end(), 0);
  if (n > 0) t->build(0, n, 0);
  return t;
}

void sags_kdtree_free(void* tree) { delete (KDTree*)tree; }

void sags_kdtree_knn(void* tree, const float* queries, int m, int k,
                     int* out_idx, float* out_d2) {
  auto* t = (KDTree*)tree;
#pragma omp parallel for schedule(guided, 8)
  for (int i = 0; i < m; i++) {
    t->knn(queries + 3 * i, k, out_idx + (size_t)i * k, out_d2 + (size_t)i * k);
  }
}

// ---------------------------------------------------------------------------
// PointCloud2-style decode: strided records with float32 x,y,z and a packed
// rgb float (the `/cloud_registered` layout, `scripts/gaussian_splatting.py:
// 105-134`). Returns n points written.
// ---------------------------------------------------------------------------
int sags_decode_xyzrgb(const uint8_t* data, int64_t n_bytes, int point_step,
                       int x_off, int rgb_off, float* out_xyz, float* out_rgb,
                       int max_out) {
  const int n = (int)std::min<int64_t>(n_bytes / point_step, max_out);
  for (int i = 0; i < n; i++) {
    const uint8_t* rec = data + (size_t)i * point_step;
    std::memcpy(out_xyz + 3 * i, rec + x_off, 12);
    uint32_t packed;
    std::memcpy(&packed, rec + rgb_off, 4);
    out_rgb[3 * i] = ((packed >> 16) & 0xFF) / 255.0f;
    out_rgb[3 * i + 1] = ((packed >> 8) & 0xFF) / 255.0f;
    out_rgb[3 * i + 2] = (packed & 0xFF) / 255.0f;
  }
  return n;
}

}  // extern "C"
