// Native host-side perspective warp — the framework's own replacement for
// the reference's cv2.getPerspectiveTransform + cv2.warpPerspective host
// path (vae-gan.py:163-200). Bilinear sampling, BORDER_REPLICATE, float
// arithmetic (no cv2 5-bit fixed point, so results are slightly *more*
// accurate than OpenCV's).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image):
//   vgm_solve_homography(src_quad[8], dst_quad[8], out_m[9]) -> 0/-1
//   vgm_warp_u8(src, h, w, c, m_inv[9], dst, out_h, out_w)
//   vgm_warp_batch_u8(...) — loop over a batch with an optional thread pool.
//
// Build: tools/build_native.py (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// Solve the 8x8 linear system for the homography mapping src->dst with
// partial-pivot Gaussian elimination (double precision).
bool solve8(double a[8][9]) {
  for (int col = 0; col < 8; ++col) {
    int pivot = col;
    for (int r = col + 1; r < 8; ++r) {
      if (std::fabs(a[r][col]) > std::fabs(a[pivot][col])) pivot = r;
    }
    if (std::fabs(a[pivot][col]) < 1e-12) return false;
    if (pivot != col) {
      for (int k = 0; k < 9; ++k) {
        double tmp = a[col][k];
        a[col][k] = a[pivot][k];
        a[pivot][k] = tmp;
      }
    }
    double inv = 1.0 / a[col][col];
    for (int k = col; k < 9; ++k) a[col][k] *= inv;
    for (int r = 0; r < 8; ++r) {
      if (r == col) continue;
      double f = a[r][col];
      if (f == 0.0) continue;
      for (int k = col; k < 9; ++k) a[r][k] -= f * a[col][k];
    }
  }
  return true;
}

}  // namespace

extern "C" {

// quads are (x0,y0, x1,y1, x2,y2, x3,y3); out_m is row-major 3x3.
int vgm_solve_homography(const float* src, const float* dst, double* out_m) {
  double a[8][9];
  for (int i = 0; i < 4; ++i) {
    double x = src[2 * i], y = src[2 * i + 1];
    double u = dst[2 * i], v = dst[2 * i + 1];
    double* ru = a[2 * i];
    double* rv = a[2 * i + 1];
    ru[0] = x; ru[1] = y; ru[2] = 1; ru[3] = 0; ru[4] = 0; ru[5] = 0;
    ru[6] = -u * x; ru[7] = -u * y; ru[8] = u;
    rv[0] = 0; rv[1] = 0; rv[2] = 0; rv[3] = x; rv[4] = y; rv[5] = 1;
    rv[6] = -v * x; rv[7] = -v * y; rv[8] = v;
  }
  if (!solve8(a)) return -1;
  for (int i = 0; i < 8; ++i) out_m[i] = a[i][8];
  out_m[8] = 1.0;
  return 0;
}

// Warp one uint8 image: for each output pixel apply m_inv (output->source
// homography), bilinear-sample with clamped (replicated) borders.
void vgm_warp_u8(const uint8_t* src, int h, int w, int c,
                 const double* m, uint8_t* dst, int out_h, int out_w) {
  const double m00 = m[0], m01 = m[1], m02 = m[2];
  const double m10 = m[3], m11 = m[4], m12 = m[5];
  const double m20 = m[6], m21 = m[7], m22 = m[8];
  for (int y = 0; y < out_h; ++y) {
    uint8_t* row = dst + static_cast<size_t>(y) * out_w * c;
    // Incremental evaluation: numerators/denominator are affine in x.
    double nu = m01 * y + m02;
    double nv = m11 * y + m12;
    double dd = m21 * y + m22;
    for (int x = 0; x < out_w; ++x, nu += m00, nv += m10, dd += m20) {
      double inv = 1.0 / dd;
      double u = nu * inv;
      double v = nv * inv;
      if (u < 0) u = 0;
      if (u > w - 1) u = w - 1;
      if (v < 0) v = 0;
      if (v > h - 1) v = h - 1;
      int x0 = static_cast<int>(u);
      int y0 = static_cast<int>(v);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
      float fx = static_cast<float>(u - x0);
      float fy = static_cast<float>(v - y0);
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * c;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * c;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * c;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * c;
      float w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
      float w10 = (1 - fx) * fy, w11 = fx * fy;
      for (int ch = 0; ch < c; ++ch) {
        float val = w00 * p00[ch] + w01 * p01[ch] + w10 * p10[ch]
                    + w11 * p11[ch];
        int iv = static_cast<int>(val + 0.5f);
        row[x * c + ch] = static_cast<uint8_t>(iv < 0 ? 0
                                               : (iv > 255 ? 255 : iv));
      }
    }
  }
}

// Crop a batch of quads (each from its own source image) to fixed patches.
// srcs: concatenated variable-size images addressed via offsets; quads in
// source pixels; dst (n, out_h, out_w, c).
void vgm_warp_batch_u8(const uint8_t* const* srcs, const int* hs,
                       const int* ws, int c, const float* quads,
                       uint8_t* dst, int n, int out_h, int out_w) {
  float rect[8] = {0.f, 0.f, static_cast<float>(out_w - 1), 0.f,
                   static_cast<float>(out_w - 1),
                   static_cast<float>(out_h - 1), 0.f,
                   static_cast<float>(out_h - 1)};
  for (int i = 0; i < n; ++i) {
    double m[9];
    // Inverse map: output rect -> source quad.
    if (vgm_solve_homography(rect, quads + 8 * i, m) != 0) {
      std::memset(dst + static_cast<size_t>(i) * out_h * out_w * c, 0,
                  static_cast<size_t>(out_h) * out_w * c);
      continue;
    }
    vgm_warp_u8(srcs[i], hs[i], ws[i], c, m,
                dst + static_cast<size_t>(i) * out_h * out_w * c,
                out_h, out_w);
  }
}

}  // extern "C"
