// Native host-side runtime for mamri_tpu: fast binary STL ingest,
// union-find connected-component labeling, and the DICOM RLE (PackBits)
// codec, plus a JPEG Lossless (T.81 process 14) decoder.
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

#include <algorithm>
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

// ------------------------------------------------------- JPEG Lossless (SOF3)
// Single-component ITU T.81 process-14 decoder — the hot path behind
// perception/jpegll.py (whose pure-Python decoder is the oracle; both must
// produce identical samples). Predictors 1-7, point transform, restart
// markers, 2-16 bit precision.
int64_t mamri_jpegll_decode(const uint8_t* data, int64_t len, uint16_t* out,
                            int64_t cap, int32_t* rows_out, int32_t* cols_out,
                            int32_t* prec_out) {
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return -1;
  int64_t pos = 2;
  uint8_t* sym_tab[4] = {nullptr, nullptr, nullptr, nullptr};
  uint8_t* len_tab[4] = {nullptr, nullptr, nullptr, nullptr};
  int rows = 0, cols = 0, prec = 0, pred_sel = 0, pt = 0, table = -1;
  int restart = 0;
  bool have_frame = false;
  int64_t scan_off = -1;
  auto cleanup = [&]() {
    for (int i = 0; i < 4; ++i) {
      std::free(sym_tab[i]);
      std::free(len_tab[i]);
    }
  };
  while (pos + 4 <= len) {
    if (data[pos] != 0xFF) { cleanup(); return -1; }
    int marker = 0xFF00 | data[pos + 1];
    int seglen = (data[pos + 2] << 8) | data[pos + 3];
    const uint8_t* body = data + pos + 4;
    int64_t blen = seglen - 2;
    if (pos + 2 + seglen > len) { cleanup(); return -1; }
    pos += 2 + seglen;
    if (marker == 0xFFC3) {  // SOF3
      if (blen < 9) { cleanup(); return -1; }
      prec = body[0];
      rows = (body[1] << 8) | body[2];
      cols = (body[3] << 8) | body[4];
      if (body[5] != 1 || rows == 0 || cols == 0 || body[7] != 0x11 ||
          prec < 2 || prec > 16) { cleanup(); return -1; }
      have_frame = true;
    } else if (marker >= 0xFFC0 && marker < 0xFFD0 && marker != 0xFFC4 &&
               marker != 0xFFC8 && marker != 0xFFCC) {
      cleanup(); return -1;  // a SOF that is not lossless process 14
    } else if (marker == 0xFFC4) {  // DHT
      int64_t off = 0;
      while (off + 17 <= blen) {
        int th = body[off] & 0x0F;
        if (th > 3) { cleanup(); return -1; }
        int nsym = 0;
        for (int i = 0; i < 16; ++i) nsym += body[off + 1 + i];
        if (off + 17 + nsym > blen) { cleanup(); return -1; }
        if (!sym_tab[th]) {
          sym_tab[th] = static_cast<uint8_t*>(std::malloc(1 << 16));
          len_tab[th] = static_cast<uint8_t*>(std::malloc(1 << 16));
          if (!sym_tab[th] || !len_tab[th]) { cleanup(); return -1; }
        }
        std::memset(len_tab[th], 0, 1 << 16);
        int code = 0, k = 0;
        for (int ln = 1; ln <= 16; ++ln) {
          for (int c = 0; c < body[off + ln]; ++c) {
            int sym = body[off + 17 + k++];
            // lossless SSSS categories are 0..16; larger symbols would drive
            // negative shift counts (UB) in the entropy loop
            if (sym > 16) { cleanup(); return -1; }
            int lo = code << (16 - ln);
            int hi = lo + (1 << (16 - ln));
            if (hi > (1 << 16)) { cleanup(); return -1; }
            for (int v = lo; v < hi; ++v) {
              sym_tab[th][v] = static_cast<uint8_t>(sym);
              len_tab[th][v] = static_cast<uint8_t>(ln);
            }
            ++code;
          }
          code <<= 1;
        }
        off += 17 + nsym;
      }
    } else if (marker == 0xFFDD) {  // DRI
      if (blen < 2) { cleanup(); return -1; }
      restart = (body[0] << 8) | body[1];
    } else if (marker == 0xFFDA) {  // SOS
      if (blen < 6 || body[0] != 1 || !have_frame) { cleanup(); return -1; }
      table = body[2] >> 4;
      pred_sel = body[3];
      pt = body[5] & 0x0F;
      if (pred_sel < 1 || pred_sel > 7 || table > 3 || !sym_tab[table] ||
          pt >= prec) {  // def = 1 << (prec-pt-1) must not shift negatively
        cleanup(); return -1;
      }
      scan_off = pos;
      break;
    }
  }
  if (scan_off < 0 || static_cast<int64_t>(rows) * cols > cap) {
    cleanup();
    return scan_off < 0 ? -1 : -2;
  }
  const uint8_t* sym = sym_tab[table];
  const uint8_t* lng = len_tab[table];
  const int64_t total = static_cast<int64_t>(rows) * cols;

  // split the entropy-coded data at RST markers, unstuffing FF 00 -> FF
  std::vector<std::vector<uint8_t>> segs;
  segs.emplace_back();
  segs.back().reserve(static_cast<size_t>(len - scan_off));
  for (int64_t p = scan_off; p < len;) {
    uint8_t b = data[p];
    if (b != 0xFF) { segs.back().push_back(b); ++p; continue; }
    if (p + 1 >= len) break;
    uint8_t m = data[p + 1];
    if (m == 0x00) { segs.back().push_back(0xFF); p += 2; }
    else if (m >= 0xD0 && m <= 0xD7) { segs.emplace_back(); p += 2; }
    else if (m == 0xFF) { ++p; }
    else break;  // EOI / other marker ends the scan
  }
  int64_t nseg_expected = restart ? (total + restart - 1) / restart : 1;
  if (static_cast<int64_t>(segs.size()) != nseg_expected ||
      (restart && restart % cols != 0)) {
    cleanup();
    return -3;
  }

  const int32_t def = 1 << (prec - pt - 1);
  int64_t idx = 0;
  int err = 0;
  for (size_t si = 0; si < segs.size() && !err; ++si) {
    const std::vector<uint8_t>& seg = segs[si];
    int64_t count = restart ? std::min<int64_t>(restart, total - idx) : total;
    uint64_t buf = 0;
    int nbuf = 0;
    size_t bp = 0;
    int64_t used = 0;
    int64_t band_start = idx;
    for (int64_t i = 0; i < count; ++i, ++idx) {
      if (nbuf < 32) {
        uint32_t w = 0;
        for (int k = 0; k < 4; ++k)
          w = (w << 8) | (bp < seg.size() ? seg[bp++] : (++bp, 0));
        buf = (buf << 32) | w;
        nbuf += 32;
      }
      uint32_t window = static_cast<uint32_t>(buf >> (nbuf - 16)) & 0xFFFF;
      int s = sym[window];
      int ln = lng[window];
      if (ln == 0) { err = -3; break; }
      int32_t diff;
      if (s == 0) { diff = 0; nbuf -= ln; used += ln; }
      else if (s == 16) { diff = 32768; nbuf -= ln; used += ln; }
      else {
        int32_t v = static_cast<int32_t>(buf >> (nbuf - ln - s)) & ((1 << s) - 1);
        nbuf -= ln + s;
        used += ln + s;
        diff = (v >= (1 << (s - 1))) ? v : v - (1 << s) + 1;
      }
      buf &= (nbuf == 64) ? ~0ull : ((1ull << nbuf) - 1);
      // prediction (T.81 H.1.1): the band after a restart re-enters the
      // top-of-scan state, so boundary rules use band-relative rows
      int64_t brow = (idx - band_start) / cols;
      int64_t j = idx % cols;
      int32_t px;
      if (brow == 0 && j == 0) px = def;
      else if (brow == 0) px = out[idx - 1];
      else if (j == 0) px = out[idx - cols];
      else {
        int32_t a = out[idx - 1], b = out[idx - cols], c = out[idx - cols - 1];
        switch (pred_sel) {
          case 1: px = a; break;
          case 2: px = b; break;
          case 3: px = c; break;
          case 4: px = a + b - c; break;
          case 5: px = a + ((b - c) >> 1); break;
          case 6: px = b + ((a - c) >> 1); break;
          default: px = (a + b) >> 1; break;
        }
      }
      out[idx] = static_cast<uint16_t>((px + diff) & 0xFFFF);
    }
    if (!err && used > static_cast<int64_t>(seg.size()) * 8) err = -3;
  }
  cleanup();
  if (err) return err;
  if (pt)
    for (int64_t i = 0; i < total; ++i) out[i] = static_cast<uint16_t>(out[i] << pt);
  *rows_out = rows;
  *cols_out = cols;
  *prec_out = prec;
  return total;
}

}  // extern "C"
