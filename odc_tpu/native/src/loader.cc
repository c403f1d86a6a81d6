// Native data-loader core: libjpeg decode + bilinear resize.
//
// TPU-native replacement for the reference's cv2 (C++) JPEG path
// (data_loaders/voc.py:195-196) and albumentations resize — implemented
// directly against libjpeg so the Python hot loop never touches pixel data.
// Exposed through a C ABI consumed via ctypes (odc_tpu/native/loader.py).
//
// All functions return 0 on success, negative error codes otherwise.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns 0 and fills rows on success.
int decode_impl(const char* path, uint8_t* out, int expect_h, int expect_w,
                int* out_h, int* out_w, bool header_only) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (header_only) {
    if (out_h) *out_h = static_cast<int>(cinfo.image_height);
    if (out_w) *out_w = static_cast<int>(cinfo.image_width);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }

  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  if (out_h) *out_h = h;
  if (out_w) *out_w = w;
  if (expect_h >= 0 && (h != expect_h || w != expect_w)) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }

  const int stride = w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Bilinear resize RGB8 (half-pixel centers, matching the common cv2/PIL
// INTER_LINEAR convention). Fixed-point 16.16 arithmetic on the inner loop.
void resize_impl(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                 int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
    return;
  }
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;

  std::vector<int> x0(dw), x1(dw), fx(dw);
  for (int x = 0; x < dw; ++x) {
    double pos = (x + 0.5) * sx - 0.5;
    if (pos < 0) pos = 0;
    int ix = static_cast<int>(pos);
    if (ix > sw - 2) ix = sw - 2 < 0 ? 0 : sw - 2;
    double frac = pos - ix;
    if (frac < 0) frac = 0;
    if (frac > 1) frac = 1;
    x0[x] = ix;
    x1[x] = ix + 1 < sw ? ix + 1 : sw - 1;
    fx[x] = static_cast<int>(frac * 65536.0 + 0.5);
  }

  for (int y = 0; y < dh; ++y) {
    double pos = (y + 0.5) * sy - 0.5;
    if (pos < 0) pos = 0;
    int iy = static_cast<int>(pos);
    if (iy > sh - 2) iy = sh - 2 < 0 ? 0 : sh - 2;
    double frac = pos - iy;
    if (frac < 0) frac = 0;
    if (frac > 1) frac = 1;
    const int fy = static_cast<int>(frac * 65536.0 + 0.5);
    const int y1 = iy + 1 < sh ? iy + 1 : sh - 1;

    const uint8_t* r0 = src + static_cast<size_t>(iy) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;

    for (int x = 0; x < dw; ++x) {
      const int xa = x0[x] * 3;
      const int xb = x1[x] * 3;
      const int wx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const int top = (r0[xa + c] << 16) + (r0[xb + c] - r0[xa + c]) * wx;
        const int bot = (r1[xa + c] << 16) + (r1[xb + c] - r1[xa + c]) * wx;
        const int64_t val =
            static_cast<int64_t>(top) +
            ((static_cast<int64_t>(bot - top) * fy) >> 16);
        drow[x * 3 + c] = static_cast<uint8_t>((val + 32768) >> 16);
      }
    }
  }
}

}  // namespace

extern "C" {

int odc_jpeg_dims(const char* path, int* h, int* w) {
  return decode_impl(path, nullptr, -1, -1, h, w, /*header_only=*/true);
}

int odc_decode_jpeg(const char* path, uint8_t* out, int h, int w) {
  return decode_impl(path, out, h, w, nullptr, nullptr, false);
}

int odc_decode_resize_jpeg(const char* path, uint8_t* out, int out_h,
                           int out_w, int* src_h, int* src_w) {
  int h = 0, w = 0;
  if (odc_jpeg_dims(path, &h, &w) != 0) return -1;
  std::vector<uint8_t> buf(static_cast<size_t>(h) * w * 3);
  int rc = decode_impl(path, buf.data(), h, w, nullptr, nullptr, false);
  if (rc != 0) return rc;
  if (src_h) *src_h = h;
  if (src_w) *src_w = w;
  resize_impl(buf.data(), h, w, out, out_h, out_w);
  return 0;
}

int odc_resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw) {
  if (sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0) return -1;
  resize_impl(src, sh, sw, dst, dh, dw);
  return 0;
}

}  // extern "C"
