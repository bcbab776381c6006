// Native host-side runtime for mamri_tpu: fast binary STL ingest,
// union-find connected-component labeling, and the DICOM RLE (PackBits)
// codec.
//
// Role: the reference delegates its host-side heavy lifting to native C++
// libraries (SimpleITK/VTK and Slicer's DICOM stack). mamri_tpu's device
// path is JAX/Pallas; this library is the native equivalent of the
// host-side pieces — the mesh data-loader feeding collision geometry, an
// independent, allocation-tight CCL used as a CPU golden/fast path
// (scipy-free deployments), and the byte-level RLE codec on the scanner
// ingest path (a pure-Python PackBits loop costs ~100 ms/slice at 256^2).
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

// ----------------------------------------------------- DICOM RLE (PackBits)
// Semantics identical to perception.dicom's Python codec (PS3.5 annex G /
// TIFF PackBits): control byte c in [0,127] copies c+1 literal bytes,
// c in [129,255] repeats the next byte 257-c times, 128 is a noop.

// Decode up to `expected` output bytes. Returns bytes written, or -1 when
// the input truncates mid-element.
int64_t mamri_packbits_decode(const uint8_t* in, int64_t n, uint8_t* out,
                              int64_t expected) {
  int64_t i = 0, o = 0;
  while (i < n && o < expected) {
    const uint8_t c = in[i++];
    if (c < 128) {
      const int64_t cnt = static_cast<int64_t>(c) + 1;
      if (i + cnt > n) return -1;
      const int64_t take = cnt < expected - o ? cnt : expected - o;
      std::memcpy(out + o, in + i, static_cast<size_t>(take));
      o += take;
      i += cnt;
    } else if (c > 128) {
      if (i >= n) return -1;
      const int64_t cnt = 257 - static_cast<int64_t>(c);
      const int64_t take = cnt < expected - o ? cnt : expected - o;
      std::memset(out + o, in[i], static_cast<size_t>(take));
      o += take;
      i += 1;
    }
  }
  return o;
}

// Encode with the same greedy (runs >= 2 become replicates; literals break
// at the next >= 3 run) as the Python encoder — byte-identical output.
// `out` must hold >= n + n/128 + 2 bytes. Returns the encoded length.
int64_t mamri_packbits_encode(const uint8_t* in, int64_t n, uint8_t* out) {
  int64_t i = 0, o = 0;
  while (i < n) {
    int64_t j = i;
    while (j + 1 < n && in[j + 1] == in[i] && j - i < 127) ++j;
    const int64_t run = j - i + 1;
    if (run >= 2) {
      out[o++] = static_cast<uint8_t>(257 - run);
      out[o++] = in[i];
      i = j + 1;
    } else {
      int64_t k = i;
      while (k < n && k - i < 128) {
        if (k + 2 < n && in[k + 1] == in[k] && in[k + 2] == in[k]) break;
        ++k;
      }
      out[o++] = static_cast<uint8_t>(k - i - 1);
      std::memcpy(out + o, in + i, static_cast<size_t>(k - i));
      o += k - i;
      i = k;
    }
  }
  return o;
}

}  // extern "C"
