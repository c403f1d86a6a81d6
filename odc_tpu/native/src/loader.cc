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

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
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

int odc_decode_resize_jpeg(const char* path, uint8_t* out, int out_h,
                           int out_w, int* src_h, int* src_w);

// Threaded batch decode+resize: n JPEGs -> one contiguous
// [n, out_h, out_w, 3] RGB8 buffer. src_hw (optional) receives n (h, w)
// pairs; rcs (optional) receives per-image status. Returns the number of
// failed images (0 = all good). This is the production input path the
// reference lacks entirely (its DataLoader runs num_workers=0,
// train.py:64-71): decode happens off the GIL on a std::thread pool while
// the device computes the previous batch.
int odc_decode_resize_batch(const char* const* paths, int n, uint8_t* out,
                            int out_h, int out_w, int* src_hw, int* rcs,
                            int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n) n_threads = n;

  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);

  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int h = 0, w = 0;
      const int rc = odc_decode_resize_jpeg(
          paths[i], out + static_cast<size_t>(i) * img_bytes, out_h, out_w,
          &h, &w);
      if (src_hw) {
        src_hw[2 * i] = h;
        src_hw[2 * i + 1] = w;
      }
      if (rcs) rcs[i] = rc;
      if (rc != 0) failed.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return failed.load();
}

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
