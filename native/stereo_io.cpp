// Native host-side data-path kernels for the training pipeline.
//
// The reference's dataloader does all decoding/resizing in Python+cv2 on the
// main thread (train/dataloader.py:333-343 — its worker-pool parameters are
// accepted but unused), which SURVEY.md flags as a throughput bottleneck.
// These C++ kernels implement the hot per-sample loops — base-255 uint8
// disparity decode, bilinear/nearest resize, ImageNet normalization, and the
// rectification-perturbation affine warp — multithreaded across rows, and
// are loaded via ctypes (foundationstereo_tpu/native.py). The Python
// implementations remain as behavioral reference and fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libstereo_io.so stereo_io.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Simple parallel-for over [0, n) with hardware-concurrency workers.
template <typename F>
void parallel_for(int64_t n, F&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int workers = std::max(1u, std::min<unsigned>(hw, 8));
  if (n < 64 || workers == 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&] {
      int64_t i;
      while ((i = next.fetch_add(16)) < n) {
        int64_t end = std::min(i + 16, n);
        for (; i < end; ++i) fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

inline int reflect101(int v, int n) {
  // OpenCV BORDER_REFLECT_101
  if (n == 1) return 0;
  int period = 2 * (n - 1);
  v = std::abs(v) % period;
  return v >= n ? period - v : v;
}

}  // namespace

extern "C" {

// 3-channel base-255 uint8 -> float disparity (Utils.py:137-140 semantics).
void decode_disparity_u8(const uint8_t* in, int64_t n_px, double scale,
                         float* out) {
  parallel_for((n_px + 4095) / 4096, [&](int64_t blk) {
    int64_t lo = blk * 4096, hi = std::min(lo + 4096, n_px);
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* p = in + 3 * i;
      out[i] = static_cast<float>(
          (p[0] * 65025.0 + p[1] * 255.0 + p[2]) / scale);
    }
  });
}

// Inverse: float -> 3-channel base-255 uint8.
void encode_disparity_u8(const float* in, int64_t n_px, double scale,
                         uint8_t* out) {
  parallel_for((n_px + 4095) / 4096, [&](int64_t blk) {
    int64_t lo = blk * 4096, hi = std::min(lo + 4096, n_px);
    for (int64_t i = lo; i < hi; ++i) {
      int64_t v = llround(static_cast<double>(in[i]) * scale);
      int64_t c0 = v / 65025, rem = v - c0 * 65025;
      int64_t c1 = rem / 255, c2 = rem - c1 * 255;
      out[3 * i] = static_cast<uint8_t>(c0);
      out[3 * i + 1] = static_cast<uint8_t>(c1);
      out[3 * i + 2] = static_cast<uint8_t>(c2);
    }
  });
}

// Bilinear resize, float32 HWC, half-pixel centers (cv2.INTER_LINEAR).
void resize_bilinear_f32(const float* src, int sh, int sw, int c, float* dst,
                         int dh, int dw) {
  double ry = static_cast<double>(sh) / dh, rx = static_cast<double>(sw) / dw;
  parallel_for(dh, [&](int64_t y) {
    double fy = (y + 0.5) * ry - 0.5;
    int y0 = static_cast<int>(std::floor(fy));
    double wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1), y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * rx - 0.5;
      int x0 = static_cast<int>(std::floor(fx));
      double wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1), x1c = std::clamp(x0 + 1, 0, sw - 1);
      const float* p00 = src + (static_cast<int64_t>(y0c) * sw + x0c) * c;
      const float* p01 = src + (static_cast<int64_t>(y0c) * sw + x1c) * c;
      const float* p10 = src + (static_cast<int64_t>(y1c) * sw + x0c) * c;
      const float* p11 = src + (static_cast<int64_t>(y1c) * sw + x1c) * c;
      float* q = dst + (y * dw + x) * c;
      for (int k = 0; k < c; ++k) {
        double top = p00[k] * (1 - wx) + p01[k] * wx;
        double bot = p10[k] * (1 - wx) + p11[k] * wx;
        q[k] = static_cast<float>(top * (1 - wy) + bot * wy);
      }
    }
  });
}

// Nearest resize, float32 HWC, floor(i*scale) indexing (matches the Python
// _resize nearest path).
void resize_nearest_f32(const float* src, int sh, int sw, int c, float* dst,
                        int dh, int dw) {
  parallel_for(dh, [&](int64_t y) {
    int sy = std::min(static_cast<int>(y * static_cast<int64_t>(sh) / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min(static_cast<int>(x * static_cast<int64_t>(sw) / dw), sw - 1);
      std::memcpy(dst + (y * dw + x) * c,
                  src + (static_cast<int64_t>(sy) * sw + sx) * c,
                  sizeof(float) * c);
    }
  });
}

// Rotation-about-center + translation, bilinear, reflect-101 border
// (cv2.warpAffine equivalent used by the rectification perturbation).
void warp_affine_reflect_f32(const float* src, int h, int w, int c, double tx,
                             double ty, double angle_deg, float* dst) {
  double a = angle_deg * M_PI / 180.0;
  double ca = std::cos(a), sa = std::sin(a);
  int cy = h / 2, cx = w / 2;
  parallel_for(h, [&](int64_t y) {
    for (int x = 0; x < w; ++x) {
      double dx = x - tx - cx, dy = y - ty - cy;
      double sx = ca * dx - sa * dy + cx;
      double sy = sa * dx + ca * dy + cy;
      int x0 = static_cast<int>(std::floor(sx));
      int y0 = static_cast<int>(std::floor(sy));
      double wx = sx - x0, wy = sy - y0;
      int x0r = reflect101(x0, w), x1r = reflect101(x0 + 1, w);
      int y0r = reflect101(y0, h), y1r = reflect101(y0 + 1, h);
      const float* p00 = src + (static_cast<int64_t>(y0r) * w + x0r) * c;
      const float* p01 = src + (static_cast<int64_t>(y0r) * w + x1r) * c;
      const float* p10 = src + (static_cast<int64_t>(y1r) * w + x0r) * c;
      const float* p11 = src + (static_cast<int64_t>(y1r) * w + x1r) * c;
      float* q = dst + (static_cast<int64_t>(y) * w + x) * c;
      for (int k = 0; k < c; ++k) {
        double top = p00[k] * (1 - wx) + p01[k] * wx;
        double bot = p10[k] * (1 - wx) + p11[k] * wx;
        q[k] = static_cast<float>(top * (1 - wy) + bot * wy);
      }
    }
  });
}

// uint8 HWC RGB -> ImageNet-normalized float32 (divide 255, mean/std).
void normalize_imagenet_u8(const uint8_t* src, int64_t n_px, float* dst) {
  static const float mean[3] = {0.485f, 0.456f, 0.406f};
  static const float inv_std[3] = {1.0f / 0.229f, 1.0f / 0.224f, 1.0f / 0.225f};
  parallel_for((n_px + 4095) / 4096, [&](int64_t blk) {
    int64_t lo = blk * 4096, hi = std::min(lo + 4096, n_px);
    for (int64_t i = lo; i < hi; ++i)
      for (int k = 0; k < 3; ++k)
        dst[3 * i + k] =
            (src[3 * i + k] * (1.0f / 255.0f) - mean[k]) * inv_std[k];
  });
}

}  // extern "C"
