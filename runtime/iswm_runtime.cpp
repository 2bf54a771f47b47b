// iswm_runtime: native host-side primitives for the metrics engine.
//
// The validation metrics path is the host-side hot loop (SURVEY §3.3): per
// frame it runs 3x3 binary morphology, 8-connected component labeling and
// per-row front extraction.  The reference delegates these to OpenCV/SciPy
// C++ inside pip wheels (reference metrics/utils/mask_utils.py:18-23,
// region_metrics.py:8-11); this library is the framework's own native
// implementation, bound via ctypes (iswm_tpu/metrics/_native.py).
//
// Semantics notes (cv2 parity):
//   - dilate pads the border with the max-identity (0 for binary);
//   - erode pads with the min-identity (1 for binary);
//   - labeling is 8-connected, two-pass union-find, labels 1..n.
//
// Build: make -C runtime   (produces libiswm_runtime.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// One 3x3 max-filter pass. border_fill: value assumed outside the image.
static void pass3x3(const uint8_t* src, uint8_t* dst, int h, int w,
                    bool is_dilate) {
  const uint8_t border = is_dilate ? 0 : 1;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      uint8_t acc = border;
      bool first = true;
      for (int dy = -1; dy <= 1; ++dy) {
        const int yy = y + dy;
        for (int dx = -1; dx <= 1; ++dx) {
          const int xx = x + dx;
          uint8_t v;
          if (yy < 0 || yy >= h || xx < 0 || xx >= w) {
            v = border;
          } else {
            v = src[yy * w + xx];
          }
          if (first) {
            acc = v;
            first = false;
          } else if (is_dilate ? (v > acc) : (v < acc)) {
            acc = v;
          }
        }
      }
      dst[y * w + x] = acc;
    }
  }
}

void iswm_dilate3x3(const uint8_t* src, uint8_t* dst, int h, int w,
                    int iterations) {
  std::vector<uint8_t> tmp(src, src + (size_t)h * w);
  std::vector<uint8_t> out((size_t)h * w);
  for (int it = 0; it < iterations; ++it) {
    pass3x3(tmp.data(), out.data(), h, w, /*is_dilate=*/true);
    tmp.swap(out);
  }
  std::memcpy(dst, tmp.data(), (size_t)h * w);
}

void iswm_erode3x3(const uint8_t* src, uint8_t* dst, int h, int w,
                   int iterations) {
  std::vector<uint8_t> tmp(src, src + (size_t)h * w);
  std::vector<uint8_t> out((size_t)h * w);
  for (int it = 0; it < iterations; ++it) {
    pass3x3(tmp.data(), out.data(), h, w, /*is_dilate=*/false);
    tmp.swap(out);
  }
  std::memcpy(dst, tmp.data(), (size_t)h * w);
}

// Union-find with path halving.
static int uf_find(std::vector<int>& parent, int i) {
  while (parent[i] != i) {
    parent[i] = parent[parent[i]];
    i = parent[i];
  }
  return i;
}

static void uf_union(std::vector<int>& parent, int a, int b) {
  a = uf_find(parent, a);
  b = uf_find(parent, b);
  if (a == b) return;
  if (a < b) {
    parent[b] = a;
  } else {
    parent[a] = b;
  }
}

// 8-connected two-pass labeling. labels: int32 out (0 = background).
// Returns number of components.
int iswm_label8(const uint8_t* src, int32_t* labels, int h, int w) {
  std::vector<int> parent(1, 0);  // parent[0] reserved for background
  // First pass: assign provisional labels, union with N/NW/NE/W neighbors.
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int idx = y * w + x;
      if (!src[idx]) {
        labels[idx] = 0;
        continue;
      }
      int neighbor_labels[4];
      int n = 0;
      if (x > 0 && labels[idx - 1]) neighbor_labels[n++] = labels[idx - 1];
      if (y > 0) {
        const int up = idx - w;
        if (labels[up]) neighbor_labels[n++] = labels[up];
        if (x > 0 && labels[up - 1]) neighbor_labels[n++] = labels[up - 1];
        if (x + 1 < w && labels[up + 1]) neighbor_labels[n++] = labels[up + 1];
      }
      if (n == 0) {
        const int fresh = (int)parent.size();
        parent.push_back(fresh);
        labels[idx] = fresh;
      } else {
        int m = neighbor_labels[0];
        for (int i = 1; i < n; ++i)
          if (neighbor_labels[i] < m) m = neighbor_labels[i];
        labels[idx] = m;
        for (int i = 0; i < n; ++i) uf_union(parent, m, neighbor_labels[i]);
      }
    }
  }
  // Flatten + renumber roots to 1..n.
  std::vector<int> remap(parent.size(), 0);
  int next = 0;
  for (size_t i = 1; i < parent.size(); ++i) {
    const int root = uf_find(parent, (int)i);
    if (remap[root] == 0 && root == (int)i) remap[root] = ++next;
  }
  // roots found above; non-root entries resolve through find
  for (int i = 0; i < h * w; ++i) {
    if (labels[i]) labels[i] = remap[uf_find(parent, labels[i])];
  }
  return next;
}

// Per-row leftmost foreground pixel. out: int32 pairs (row, col), capacity h.
// Returns count of rows with foreground.
int iswm_front_positions(const uint8_t* src, int32_t* out, int h, int w) {
  int k = 0;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + (size_t)y * w;
    for (int x = 0; x < w; ++x) {
      if (row[x]) {
        out[2 * k] = y;
        out[2 * k + 1] = x;
        ++k;
        break;
      }
    }
  }
  return k;
}

}  // extern "C"
