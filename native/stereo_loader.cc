// Native stereo-image loading pipeline.
//
// Replaces the reference's torch DataLoader worker *processes*
// (reference main.py:102-105) with an in-process C++ thread pool:
// PNG decode (libpng) -> PIL-compatible triangle-filter bilinear resize ->
// float32 [0,1] NHWC, written straight into a caller-provided batch buffer
// (zero Python-side copies, no pickling across process boundaries).
//
// Exposed via a C ABI for ctypes:
//   int umt_decode_resize_batch(const char** paths, int n,
//                               int out_h, int out_w,
//                               float* out, int num_threads);
// Returns 0 on success, else the 1-based index of the first failed file.

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<unsigned char> rgb;  // HWC, 3 channels
};

bool decode_png_rgb(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);

  // Normalise every input to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = static_cast<int>(width);
  out->h = static_cast<int>(height);
  out->rgb.resize(static_cast<size_t>(width) * height * 3);

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * width * 3;
  png_read_image(png, rows.data());

  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// PIL-style separable triangle-filter resampling coefficients: for
// downscaling the filter support widens by the scale factor (area-average
// behaviour), matching PIL.Image.BILINEAR within float rounding.
struct ResampleCoeffs {
  std::vector<int> bounds;    // 2 per output pixel: (xmin, xsize)
  std::vector<double> coeffs; // ksize per output pixel
  int ksize = 0;
};

ResampleCoeffs triangle_coeffs(int in_size, int out_size) {
  ResampleCoeffs rc;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // triangle filter support = 1
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  rc.ksize = ksize;
  rc.bounds.resize(out_size * 2);
  rc.coeffs.resize(static_cast<size_t>(out_size) * ksize);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &rc.coeffs[static_cast<size_t>(xx) * ksize];
    int x = 0;
    for (; x < xmax; ++x) {
      double arg = (x + xmin - center + 0.5) * ss;
      double w = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (w < 0) w = 0;
      k[x] = w;
      ww += w;
    }
    for (int i = 0; i < xmax; ++i)
      if (ww != 0.0) k[i] /= ww;
    for (; x < ksize; ++x) k[x] = 0;
    rc.bounds[xx * 2] = xmin;
    rc.bounds[xx * 2 + 1] = xmax;
  }
  return rc;
}

// Resize an RGB8 image to (out_h, out_w) float32 [0,1], HWC.
void resize_to_float(const Image& img, int out_h, int out_w, float* out) {
  ResampleCoeffs cx = triangle_coeffs(img.w, out_w);
  ResampleCoeffs cy = triangle_coeffs(img.h, out_h);

  // horizontal pass: (h, out_w, 3) floats
  std::vector<float> tmp(static_cast<size_t>(img.h) * out_w * 3);
  for (int y = 0; y < img.h; ++y) {
    const unsigned char* row = img.rgb.data() + static_cast<size_t>(y) * img.w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = cx.bounds[xx * 2], xsize = cx.bounds[xx * 2 + 1];
      const double* k = &cx.coeffs[static_cast<size_t>(xx) * cx.ksize];
      double acc[3] = {0, 0, 0};
      for (int x = 0; x < xsize; ++x) {
        const unsigned char* px = row + (xmin + x) * 3;
        acc[0] += px[0] * k[x];
        acc[1] += px[1] * k[x];
        acc[2] += px[2] * k[x];
      }
      trow[xx * 3 + 0] = static_cast<float>(acc[0]);
      trow[xx * 3 + 1] = static_cast<float>(acc[1]);
      trow[xx * 3 + 2] = static_cast<float>(acc[2]);
    }
  }

  // vertical pass + normalise to [0,1]
  const float inv255 = 1.0f / 255.0f;
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = cy.bounds[yy * 2], ysize = cy.bounds[yy * 2 + 1];
    const double* k = &cy.coeffs[static_cast<size_t>(yy) * cy.ksize];
    float* orow = out + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w * 3; ++xx) {
      double acc = 0;
      for (int y = 0; y < ysize; ++y)
        acc += tmp[static_cast<size_t>(ymin + y) * out_w * 3 + xx] * k[y];
      // PIL clips and rounds to uint8 between passes; we keep float but
      // clip to the valid range for identical downstream behaviour.
      float v = static_cast<float>(acc);
      if (v < 0) v = 0;
      if (v > 255.0f) v = 255.0f;
      orow[xx] = v * inv255;
    }
  }
}

}  // namespace

extern "C" {

// Decode + resize + normalise `n` PNGs into out[n, out_h, out_w, 3] float32.
// Returns 0 on success; on failure, the 1-based index of the first bad file.
int umt_decode_resize_batch(const char** paths, int n, int out_h, int out_w,
                            float* out, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  size_t stride = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      Image img;
      if (!decode_png_rgb(paths[i], &img)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
      resize_to_float(img, out_h, out_w, out + stride * i);
    }
  };

  std::vector<std::thread> threads;
  int nt = num_threads < n ? num_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
