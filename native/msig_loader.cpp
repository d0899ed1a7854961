// msig_loader — native data-loader core for the msig_tpu input pipeline.
//
// The reference feeds its trainer from 4 torch DataLoader worker processes
// doing PIL decode + crop/rotate (reference trainer.py:287-290,
// dataset.py:16-22). This library is the TPU-build equivalent: JPEG/PNG
// decode (libjpeg/libpng), fused crop+bilinear-resize (triangle filter with
// support scaling, matching PIL's BILINEAR box-resize semantics), k*90
// rotation, and a threaded batch API — callable from Python via ctypes
// (msig_tpu/data/native_loader.py).
//
// C ABI:
//   msig_image_size(path, &w, &h)               header-only dimensions
//   msig_decode_resize(path, size, top, left, crop_h, crop_w, rot_k, out)
//   msig_load_batch(paths, n, size, crops, rots, out, n_threads)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <csetjmp>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h * w * 3
};

// ------------------------------ JPEG ---------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out, bool header_only) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  out->w = static_cast<int>(cinfo.image_width);
  out->h = static_cast<int>(cinfo.image_height);
  if (header_only) {
    jpeg_destroy_decompress(&cinfo);
    return true;
  }
  jpeg_start_decompress(&cinfo);
  out->w = static_cast<int>(cinfo.output_width);
  out->h = static_cast<int>(cinfo.output_height);
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------- PNG ---------------------------------

bool decode_png(FILE* f, Image* out, bool header_only) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  out->w = static_cast<int>(png_get_image_width(png, info));
  out->h = static_cast<int>(png_get_image_height(png, info));
  if (header_only) {
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
  }
  // Normalize anything to 8-bit RGB.
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out, bool header_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, out, header_only);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out, header_only);
  }
  fclose(f);
  return ok;
}

// --------------------- crop + bilinear resize ------------------------
//
// Separable triangle (bilinear) filter with support scaling, the same
// algorithm family PIL uses for Image.resize(..., BILINEAR, box=...):
// when downscaling, the filter widens by the scale factor (antialias).

struct FilterTaps {
  std::vector<int> start;      // first source index per dest pixel
  std::vector<int> count;      // tap count per dest pixel
  std::vector<float> weights;  // max_count taps per dest pixel (row-major)
  int max_count = 0;
};

FilterTaps build_taps(int src_size, int dst_size, float box_start, float box_size) {
  FilterTaps t;
  const float scale = box_size / dst_size;
  const float support = (scale < 1.0f ? 1.0f : scale);  // filter half-width
  t.max_count = static_cast<int>(std::ceil(support) * 2 + 1);
  t.start.resize(dst_size);
  t.count.resize(dst_size);
  t.weights.assign(static_cast<size_t>(dst_size) * t.max_count, 0.0f);
  for (int i = 0; i < dst_size; ++i) {
    const float center = box_start + (i + 0.5f) * scale;
    int lo = static_cast<int>(std::floor(center - support));
    int hi = static_cast<int>(std::ceil(center + support));
    lo = std::max(lo, 0);
    hi = std::min(hi, src_size);
    if (hi <= lo) {  // degenerate box: clamp to nearest pixel
      lo = std::min(std::max(static_cast<int>(center), 0), src_size - 1);
      hi = lo + 1;
    }
    float total = 0.0f;
    float* w = &t.weights[static_cast<size_t>(i) * t.max_count];
    for (int s = lo; s < hi; ++s) {
      float x = (s + 0.5f - center) / (scale < 1.0f ? 1.0f : scale);
      float v = (std::fabs(x) < 1.0f ? 1.0f - std::fabs(x) : 0.0f);
      w[s - lo] = v;
      total += v;
    }
    if (total <= 0.0f) {
      w[0] = 1.0f;
      total = 1.0f;
      hi = lo + 1;
    }
    for (int s = 0; s < hi - lo; ++s) w[s] /= total;
    t.start[i] = lo;
    t.count[i] = hi - lo;
  }
  return t;
}

void resize_box(const Image& src, int top, int left, int crop_h, int crop_w,
                int out_size, uint8_t* out) {
  FilterTaps tx = build_taps(src.w, out_size, static_cast<float>(left),
                             static_cast<float>(crop_w));
  FilterTaps ty = build_taps(src.h, out_size, static_cast<float>(top),
                             static_cast<float>(crop_h));
  // Horizontal pass into a float intermediate [src.h x out_size x 3]
  std::vector<float> tmp(static_cast<size_t>(src.h) * out_size * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.rgb.data() + static_cast<size_t>(y) * src.w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      const float* w = &tx.weights[static_cast<size_t>(x) * tx.max_count];
      float acc[3] = {0, 0, 0};
      const int s0 = tx.start[x], cnt = tx.count[x];
      for (int s = 0; s < cnt; ++s) {
        const uint8_t* px = row + static_cast<size_t>(s0 + s) * 3;
        acc[0] += w[s] * px[0];
        acc[1] += w[s] * px[1];
        acc[2] += w[s] * px[2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  // Vertical pass to uint8
  for (int y = 0; y < out_size; ++y) {
    const float* w = &ty.weights[static_cast<size_t>(y) * ty.max_count];
    const int s0 = ty.start[y], cnt = ty.count[y];
    uint8_t* orow = out + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      float acc[3] = {0, 0, 0};
      for (int s = 0; s < cnt; ++s) {
        const float* px = tmp.data() + (static_cast<size_t>(s0 + s) * out_size + x) * 3;
        acc[0] += w[s] * px[0];
        acc[1] += w[s] * px[1];
        acc[2] += w[s] * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c];
        orow[x * 3 + c] =
            static_cast<uint8_t>(v < 0.f ? 0 : (v > 255.f ? 255 : v + 0.5f));
      }
    }
  }
}

void rotate90(uint8_t* buf, int size, int k) {
  // numpy rot90 semantics (counterclockwise): out[i][j] = in[j][size-1-i]
  k = ((k % 4) + 4) % 4;
  if (k == 0) return;
  std::vector<uint8_t> src(buf, buf + static_cast<size_t>(size) * size * 3);
  for (int r = 0; r < k; ++r) {
    for (int i = 0; i < size; ++i)
      for (int j = 0; j < size; ++j)
        std::memcpy(buf + (static_cast<size_t>(i) * size + j) * 3,
                    src.data() + (static_cast<size_t>(j) * size + (size - 1 - i)) * 3,
                    3);
    if (r + 1 < k) std::memcpy(src.data(), buf, src.size());
  }
}

}  // namespace

extern "C" {

int msig_image_size(const char* path, int* w, int* h) {
  Image img;
  if (!decode_file(path, &img, /*header_only=*/true)) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

int msig_decode_resize(const char* path, int out_size, int top, int left,
                       int crop_h, int crop_w, int rot_k, uint8_t* out) {
  Image img;
  if (!decode_file(path, &img, /*header_only=*/false)) return -1;
  if (crop_h <= 0 || crop_w <= 0) {  // full image
    top = 0;
    left = 0;
    crop_h = img.h;
    crop_w = img.w;
  }
  resize_box(img, top, left, crop_h, crop_w, out_size, out);
  rotate90(out, out_size, rot_k);
  return 0;
}

int msig_load_batch(const char** paths, int n, int out_size, const int* crops,
                    const int* rots, uint8_t* out, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const int* c = crops ? crops + 4 * i : nullptr;
      int rc = msig_decode_resize(paths[i], out_size, c ? c[0] : 0,
                                  c ? c[1] : 0, c ? c[2] : -1, c ? c[3] : -1,
                                  rots ? rots[i] : 0, out + stride * i);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(threads - 1);
  for (int t = 1; t < threads; ++t) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
