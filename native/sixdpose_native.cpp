// Native host-side runtime kernels for sixdpose_tpu.
//
// The TPU owns the compute path (JAX/XLA); these are the serial,
// latency-bound host algorithms that sit between device stages, where the
// reference implementation also used native code:
//
// - select_scattered: greedy scattered feature selection with relaxing
//   distance (reference selectScatteredFeatures,
//   linemodLevelup.cpp:279-318) — the train-time inner loop.
// - floyd_steinberg: serpentine density error-diffusion seeding for DASP
//   (reference FloydSteinberg.cpp:35-138) — inherently serial, O(H*W).
// - nms_boxes: greedy box NMS over score-sorted candidates (driver-side
//   NMS, linemod_and_levelup_test.py:34-61).
// - union_find_flatten: path-compressed union-find resolution used by the
//   convex-grouping passes (DASP.cpp:365-470).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// Python binding: ctypes (sixdpose_tpu/native_bridge.py), with pure-Python
// fallbacks when the library is absent.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Greedy scattered selection.  Inputs are score-sorted descending.
// Returns the number of selected indices written to out_idx (up to
// num_features).  Mirrors the reference exactly: restart with distance-1
// when the list is exhausted; duplicates become possible once the relaxed
// distance reaches <= 0, which guarantees termination.
int select_scattered(const int32_t* xs, const int32_t* ys, int32_t n,
                     int32_t num_features, float distance,
                     int32_t* out_idx) {
  if (n <= 0 || num_features <= 0) return 0;
  std::vector<int32_t> sel;
  sel.reserve(num_features);
  float dist = distance;
  float dist_sq = dist * dist;
  int32_t i = 0;
  int guard = 0;
  while ((int32_t)sel.size() < num_features) {
    bool keep = true;
    for (int32_t j : sel) {
      const float dx = (float)(xs[i] - xs[j]);
      const float dy = (float)(ys[i] - ys[j]);
      if (dx * dx + dy * dy < dist_sq) {
        keep = false;
        break;
      }
    }
    if (keep) sel.push_back(i);
    if (++i == n) {
      i = 0;
      dist -= 1.0f;
      dist_sq = dist * dist;
      if (++guard > 10000) return -1;
    }
  }
  std::memcpy(out_idx, sel.data(), sel.size() * sizeof(int32_t));
  return (int32_t)sel.size();
}

// Floyd-Steinberg density dithering (serpentine scan, 7/16 3/16 5/16 1/16).
// Writes up to max_seeds (x, y) pairs into out_xy; returns the seed count
// (which may exceed max_seeds — callers should size generously; excess
// seeds are counted but not written).
int floyd_steinberg(const float* density, int32_t h, int32_t w,
                    float* out_xy, int32_t max_seeds) {
  std::vector<double> err(density, density + (size_t)h * w);
  int32_t count = 0;
  for (int32_t y = 0; y < h; ++y) {
    const bool ltr = (y % 2 == 0);
    const int32_t x0 = ltr ? 0 : w - 1;
    const int32_t x1 = ltr ? w : -1;
    const int32_t step = ltr ? 1 : -1;
    for (int32_t x = x0; x != x1; x += step) {
      double v = err[(size_t)y * w + x];
      double out = (v >= 0.5) ? 1.0 : 0.0;
      if (out > 0.0) {
        if (count < max_seeds) {
          out_xy[2 * count] = (float)x;
          out_xy[2 * count + 1] = (float)y;
        }
        ++count;
      }
      const double e = v - out;
      const int32_t xs_ = x + step;
      if (0 <= xs_ && xs_ < w) err[(size_t)y * w + xs_] += e * 7.0 / 16.0;
      if (y + 1 < h) {
        const int32_t xb = x - step;
        if (0 <= xb && xb < w) err[(size_t)(y + 1) * w + xb] += e * 3.0 / 16.0;
        err[(size_t)(y + 1) * w + x] += e * 5.0 / 16.0;
        if (0 <= xs_ && xs_ < w) err[(size_t)(y + 1) * w + xs_] += e * 1.0 / 16.0;
      }
    }
  }
  return count;
}

// Greedy box NMS.  boxes: (n, 4) x,y,w,h; scores sorted descending;
// valid[i] != 0 marks live candidates.  keep is written 0/1.
void nms_boxes(const float* boxes, const uint8_t* valid, int32_t n,
               float iou_thresh, uint8_t* keep) {
  for (int32_t i = 0; i < n; ++i) keep[i] = valid[i];
  for (int32_t i = 0; i < n; ++i) {
    if (!keep[i]) continue;
    const float xi = boxes[4 * i], yi = boxes[4 * i + 1];
    const float wi = boxes[4 * i + 2], hi = boxes[4 * i + 3];
    const float ai = (wi > 0 ? wi : 0) * (hi > 0 ? hi : 0);
    for (int32_t j = i + 1; j < n; ++j) {
      if (!keep[j]) continue;
      const float xj = boxes[4 * j], yj = boxes[4 * j + 1];
      const float wj = boxes[4 * j + 2], hj = boxes[4 * j + 3];
      const float aj = (wj > 0 ? wj : 0) * (hj > 0 ? hj : 0);
      const float ix1 = xi > xj ? xi : xj;
      const float iy1 = yi > yj ? yi : yj;
      const float ix2 = (xi + wi) < (xj + wj) ? (xi + wi) : (xj + wj);
      const float iy2 = (yi + hi) < (yj + hj) ? (yi + hi) : (yj + hj);
      const float iw = ix2 - ix1 > 0 ? ix2 - ix1 : 0;
      const float ih = iy2 - iy1 > 0 ? iy2 - iy1 : 0;
      const float inter = iw * ih;
      const float uni = ai + aj - inter;
      if (uni > 1e-9f && inter / uni > iou_thresh) keep[j] = 0;
    }
  }
}

// Path-compressed union-find flatten: parent array in/out.
void union_find_flatten(int32_t* parent, int32_t n) {
  for (int32_t i = 0; i < n; ++i) {
    int32_t r = i;
    while (parent[r] != r) r = parent[r];
    int32_t c = i;
    while (parent[c] != r) {
      int32_t nxt = parent[c];
      parent[c] = r;
      c = nxt;
    }
  }
}

}  // extern "C"
