// panfusion-tpu native host kernels: equirect resampling for the data loader.
//
// The reference's per-item data pipeline leans on native backends for its
// projection hot path (cv2.remap C++ in
// external/Perspective_and_Equirectangular/e2p.py:77-80, kornia CUDA remap
// on device) — this is the first-party C++ equivalent feeding the TPU input
// pipeline: grid building (pers->equi ray math) fused with bilinear/nearest
// sampling, over OpenMP when available.
//
// Exposed as a tiny C ABI consumed via ctypes (panfusion_tpu/ops/host.py).
// Layout: images are HWC float32 or uint8; coordinates follow the
// align_corners=True pixel-center convention used across the framework
// (panfusion_tpu/ops/resample.py).

#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline float wrap_coord(float v, int size) {
  float m = std::fmod(v, static_cast<float>(size));
  if (m < 0) m += static_cast<float>(size);
  return m;
}

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear sample of `cn` channels starting at img (which may be offset
// into a (H, W, stride) image) at pixel coords (x, y).
// border: 0 = zeros, 1 = wrap x / clamp y (equirect convention), 2 = clamp.
template <typename T>
inline void sample_bilinear(const T* img, int H, int W, int stride, int cn,
                            float x, float y, int border, float* out) {
  float x0f = std::floor(x), y0f = std::floor(y);
  int x0 = static_cast<int>(x0f), y0 = static_cast<int>(y0f);
  float fx = x - x0f, fy = y - y0f;

  for (int c = 0; c < cn; ++c) out[c] = 0.0f;

  const float wgt[4] = {(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy,
                        fx * fy};
  const int xs[4] = {x0, x0 + 1, x0, x0 + 1};
  const int ys[4] = {y0, y0, y0 + 1, y0 + 1};

  for (int k = 0; k < 4; ++k) {
    int xi = xs[k], yi = ys[k];
    if (border == 1) {  // wrap x, clamp y (equirect convention)
      xi = static_cast<int>(wrap_coord(static_cast<float>(xi), W));
      yi = clampi(yi, 0, H - 1);
    } else if (border == 2) {
      xi = clampi(xi, 0, W - 1);
      yi = clampi(yi, 0, H - 1);
    } else {
      if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
    }
    const T* px = img + (static_cast<int64_t>(yi) * W + xi) * stride;
    for (int c = 0; c < cn; ++c)
      out[c] += wgt[k] * static_cast<float>(px[c]);
  }
}

}  // namespace

extern "C" {

// Generic remap: sample src (H, W, C) at coords x/y (h, w) -> dst (h, w, C).
// mode: 0 = bilinear, 1 = nearest. border: 0 zeros / 1 wrap-x / 2 clamp.
void pf_remap_f32(const float* src, int H, int W, int C, const float* xs,
                  const float* ys, int h, int w, int mode, int border,
                  float* dst) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int i = 0; i < h * w; ++i) {
    float x = xs[i], y = ys[i];
    float* out = dst + static_cast<int64_t>(i) * C;
    if (mode == 1) {
      int xi = static_cast<int>(std::lround(x));
      int yi = static_cast<int>(std::lround(y));
      if (border == 1) {
        xi = static_cast<int>(wrap_coord(static_cast<float>(xi), W));
        yi = clampi(yi, 0, H - 1);
      } else if (border == 2) {
        xi = clampi(xi, 0, W - 1);
        yi = clampi(yi, 0, H - 1);
      } else if (xi < 0 || xi >= W || yi < 0 || yi >= H) {
        for (int c = 0; c < C; ++c) out[c] = 0.0f;
        continue;
      }
      const float* px = src + (static_cast<int64_t>(yi) * W + xi) * C;
      for (int c = 0; c < C; ++c) out[c] = px[c];
    } else {
      sample_bilinear(src, H, W, C, C, x, y, border, out);
    }
  }
}

// uint8 variant of pf_remap (image IO path), writes uint8 with rounding.
void pf_remap_u8(const uint8_t* src, int H, int W, int C, const float* xs,
                 const float* ys, int h, int w, int mode, int border,
                 uint8_t* dst) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int i = 0; i < h * w; ++i) {
    float tmp[16];
    float x = xs[i], y = ys[i];
    uint8_t* out = dst + static_cast<int64_t>(i) * C;
    if (mode == 1) {
      int xi = static_cast<int>(std::lround(x));
      int yi = static_cast<int>(std::lround(y));
      if (border == 1) {
        xi = static_cast<int>(wrap_coord(static_cast<float>(xi), W));
        yi = clampi(yi, 0, H - 1);
      } else if (border == 2) {
        xi = clampi(xi, 0, W - 1);
        yi = clampi(yi, 0, H - 1);
      } else if (xi < 0 || xi >= W || yi < 0 || yi >= H) {
        std::memset(out, 0, C);
        continue;
      }
      std::memcpy(out, src + (static_cast<int64_t>(yi) * W + xi) * C, C);
    } else {
      // channel-chunked through the fixed tmp buffer so arbitrary C
      // never overflows the stack
      for (int c0 = 0; c0 < C; c0 += 16) {
        int cn = C - c0 < 16 ? C - c0 : 16;
        sample_bilinear(src + c0, H, W, C, cn, x, y, border, tmp);
        for (int c = 0; c < cn; ++c) {
          float v = tmp[c];
          out[c0 + c] =
              static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
        }
      }
    }
  }
}

}  // extern "C"
