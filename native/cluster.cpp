// Triangle cluster builder (median split), C ABI for ctypes.
//
// Native counterpart of ops/bvh.py::build_clusters: recursively splits
// triangle centroids along the widest axis until <= cluster_size remain.
// The Python/numpy builder is fine for the reference's thousand-triangle
// assets; this one is for production meshes (millions of triangles), where
// the O(n log^2 n) build should not run in the interpreter.
//
// Output: a permutation of triangle indices plus (start, count) leaf
// extents, in deterministic (stable-sort) order identical to the Python
// builder.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Builder {
  const float *centroids;  // (n, 3)
  int cluster_size;
  std::vector<int64_t> leaf_start;
  std::vector<int64_t> leaf_count;

  void split(int64_t *idx, int64_t n, int64_t base) {
    if (n <= cluster_size) {
      leaf_start.push_back(base);
      leaf_count.push_back(n);
      return;
    }
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < n; i++) {
      const float *c = centroids + 3 * idx[i];
      for (int a = 0; a < 3; a++) {
        lo[a] = std::min(lo[a], c[a]);
        hi[a] = std::max(hi[a], c[a]);
      }
    }
    int axis = 0;
    float ext = hi[0] - lo[0];
    for (int a = 1; a < 3; a++)
      if (hi[a] - lo[a] > ext) {
        ext = hi[a] - lo[a];
        axis = a;
      }
    const float *cent = centroids;
    std::stable_sort(idx, idx + n, [cent, axis](int64_t a, int64_t b) {
      return cent[3 * a + axis] < cent[3 * b + axis];
    });
    int64_t half = n / 2;
    split(idx, half, base);
    split(idx + half, n - half, base + half);
  }
};

}  // namespace

extern "C" {

// Build clusters over n triangle centroids ((n,3) float32). Writes the
// permutation into perm (length n, caller-allocated) and returns the
// number of leaves; leaf extents go to starts/counts (caller-allocated,
// capacity >= 2n/cluster_size + 1). Returns -1 on bad input.
int64_t cutrace_build_clusters(const float *centroids, int64_t n,
                               int64_t cluster_size, int64_t *perm,
                               int64_t *starts, int64_t *counts) {
  if (!centroids || n < 0 || cluster_size < 1) return -1;
  for (int64_t i = 0; i < n; i++) perm[i] = i;
  if (n == 0) return 0;
  Builder b;
  b.centroids = centroids;
  b.cluster_size = int(cluster_size);
  b.split(perm, n, 0);
  for (size_t i = 0; i < b.leaf_start.size(); i++) {
    starts[i] = b.leaf_start[i];
    counts[i] = b.leaf_count[i];
  }
  return int64_t(b.leaf_start.size());
}

}  // extern "C"
