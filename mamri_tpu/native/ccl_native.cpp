// Native host-side runtime for mamri_tpu: fast binary STL ingest and
// union-find connected-component labeling.
//
// Role: the reference delegates its host-side heavy lifting to native C++
// libraries (SimpleITK/VTK). mamri_tpu's device path is JAX/Pallas; this
// library is the native equivalent of the host-side pieces — the mesh
// data-loader feeding collision geometry, and an independent, allocation-tight
// CCL used as a CPU golden/fast path (scipy-free deployments).
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC ccl_native.cpp -o libmamri_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- STL ingest
// Parses a binary STL file. Returns the number of triangles and fills
// *out_vertices with a malloc'd [n_tri * 9] float array (v0 v1 v2 per tri).
// Returns -1 on error. Caller frees with mamri_free.
int mamri_parse_stl(const char* path, float** out_vertices) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  unsigned char header[84];
  if (std::fread(header, 1, 84, f) != 84) {
    std::fclose(f);
    return -1;
  }
  uint32_t n_tri;
  std::memcpy(&n_tri, header + 80, 4);
  // 50 bytes per record: 12 floats (normal + 3 vertices) + 2 attribute bytes
  std::vector<unsigned char> rec(50);
  float* verts = static_cast<float*>(std::malloc(sizeof(float) * 9ull * n_tri));
  if (!verts) {
    std::fclose(f);
    return -1;
  }
  for (uint32_t t = 0; t < n_tri; ++t) {
    if (std::fread(rec.data(), 1, 50, f) != 50) {
      std::free(verts);
      std::fclose(f);
      return -1;
    }
    // skip the 12-byte normal; copy the 36 vertex bytes
    std::memcpy(verts + 9ull * t, rec.data() + 12, 36);
  }
  std::fclose(f);
  *out_vertices = verts;
  return static_cast<int>(n_tri);
}

void mamri_free(void* p) { std::free(p); }

// ------------------------------------------------------- union-find 6-conn CCL
// mask: nx*ny*nz uint8 (C order, x-major: index = (i*ny + j)*nz + k).
// labels_out: same extent int32. Background = 0; components numbered 1..K in
// ITK raster order (first voxel in (z, y, x)-lexicographic order), matching
// the device pipeline's label ordering convention.
// Returns K.
namespace {
struct UnionFind {
  std::vector<int32_t> parent;
  int32_t find(int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a;
    else parent[a] = b;
  }
};
}  // namespace

int mamri_label_components(const uint8_t* mask, int nx, int ny, int nz,
                           int32_t* labels_out) {
  const int64_t n = static_cast<int64_t>(nx) * ny * nz;
  // provisional labels = linear index where mask, else -1
  UnionFind uf;
  uf.parent.resize(n);
  for (int64_t i = 0; i < n; ++i) uf.parent[i] = static_cast<int32_t>(i);

  auto at = [&](int i, int j, int k) -> int64_t {
    return (static_cast<int64_t>(i) * ny + j) * nz + k;
  };

  for (int i = 0; i < nx; ++i) {
    for (int j = 0; j < ny; ++j) {
      for (int k = 0; k < nz; ++k) {
        const int64_t idx = at(i, j, k);
        if (!mask[idx]) continue;
        if (i > 0 && mask[at(i - 1, j, k)]) uf.unite(idx, at(i - 1, j, k));
        if (j > 0 && mask[at(i, j - 1, k)]) uf.unite(idx, at(i, j - 1, k));
        if (k > 0 && mask[at(i, j, k - 1)]) uf.unite(idx, at(i, j, k - 1));
      }
    }
  }

  // resolve roots; find each component's first voxel in (z, y, x) raster order
  std::vector<int32_t> order_label(n, 0);
  int32_t next = 0;
  for (int k = 0; k < nz; ++k) {
    for (int j = 0; j < ny; ++j) {
      for (int i = 0; i < nx; ++i) {
        const int64_t idx = at(i, j, k);
        if (!mask[idx]) continue;
        const int32_t root = uf.find(static_cast<int32_t>(idx));
        if (order_label[root] == 0) order_label[root] = ++next;
      }
    }
  }
  for (int64_t idx = 0; idx < n; ++idx) {
    labels_out[idx] = mask[idx] ? order_label[uf.find(static_cast<int32_t>(idx))] : 0;
  }
  return next;
}

}  // extern "C"
