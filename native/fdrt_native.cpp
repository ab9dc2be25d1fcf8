// fdrt_native: host-side JPEG decode + letterbox preprocessing, C++.
//
// The TPU is fed by host threads; python/cv2 decode becomes the bottleneck
// once the device pipeline is fused (the reference's loader is a serial
// python loop — extract_faces_from_dataset.py:379-448). This library decodes
// JPEGs with libjpeg (using DCT scaling to skip work on large downscales)
// and letterboxes into a caller-provided fixed buffer, with a pthread pool
// for batch decode. Exposed as a plain C ABI consumed via ctypes
// (face_detection_and_recognition_tpu/utils/native.py).
//
// Build: make -C native   (produces libfdrt_native.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize HWC u8 -> u8 (half-pixel centers, cv2-compatible).
// Fixed-point (11-bit) weights with precomputed per-column tables; the
// horizontal pass is separated from the vertical pass so each row is
// interpolated once into an int16 scratch line shared by output rows.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw, int ch) {
  constexpr int kBits = 11;
  constexpr int kOne = 1 << kBits;
  std::vector<int> x0s(dw), x1s(dw), wxs(dw);
  const float sx = static_cast<float>(sw) / dw;
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
    int x0 = static_cast<int>(fx);
    x0s[x] = x0 * ch;
    x1s[x] = std::min(x0 + 1, sw - 1) * ch;
    wxs[x] = static_cast<int>((fx - x0) * kOne + 0.5f);
  }
  // horizontal-pass cache: two source rows interpolated to dw columns
  std::vector<int32_t> row_a(dw * ch), row_b(dw * ch);
  int cached_a = -1, cached_b = -1;
  const float sy = static_cast<float>(sh) / dh;

  auto hline = [&](int yi, std::vector<int32_t>& line) {
    const uint8_t* s = src + static_cast<size_t>(yi) * sw * ch;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = s + x0s[x];
      const uint8_t* p1 = s + x1s[x];
      int wx = wxs[x];
      int32_t* o = line.data() + x * ch;
      for (int c = 0; c < ch; ++c)
        o[c] = p0[c] * (kOne - wx) + p1[c] * wx;  // scaled by kOne
    }
  };

  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    int wy = static_cast<int>((fy - y0) * kOne + 0.5f);
    if (cached_a != y0) {
      if (cached_b == y0) {
        std::swap(row_a, row_b);
        std::swap(cached_a, cached_b);
      } else {
        hline(y0, row_a);
        cached_a = y0;
      }
    }
    if (cached_b != y1) {
      hline(y1, row_b);
      cached_b = y1;
    }
    uint8_t* out = dst + static_cast<size_t>(y) * dw * ch;
    const int32_t* ra = row_a.data();
    const int32_t* rb = row_b.data();
    const int n = dw * ch;
    for (int i = 0; i < n; ++i) {
      int64_t v = static_cast<int64_t>(ra[i]) * (kOne - wy) +
                  static_cast<int64_t>(rb[i]) * wy;
      out[i] = static_cast<uint8_t>((v + (1 << (2 * kBits - 1))) >> (2 * kBits));
    }
  }
}

// Decode one JPEG into an RGB buffer. Returns 0 on success.
int decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* h, int* w, int target_min_dim) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT scaling: decode at 1/2, 1/4, 1/8 when heavily downscaling.
  if (target_min_dim > 0) {
    int min_dim = std::min(static_cast<int>(cinfo.image_width),
                           static_cast<int>(cinfo.image_height));
    int denom = 1;
    while (denom < 8 && min_dim / (denom * 2) >= target_min_dim) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  int ch = cinfo.output_components;  // 3 (RGB)
  out->resize(static_cast<size_t>(*w) * *h * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() +
                   static_cast<size_t>(cinfo.output_scanline) * *w * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Decode JPEG bytes -> letterboxed BGR u8 HWC [out_h, out_w, 3] with fill
// color, reference letterbox geometry (scale=min, int-trunc scaled dims,
// floor-split padding). Returns 0 ok, -1 decode error.
int fdrt_decode_letterbox(const uint8_t* data, size_t len, int out_w,
                          int out_h, uint8_t fill, uint8_t* out_buf) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  // decode to roughly >= target size so DCT scaling never hurts quality
  if (decode_jpeg(data, len, &rgb, &h, &w, std::max(out_w, out_h)) != 0)
    return -1;
  float scale = std::min(static_cast<float>(out_w) / w,
                         static_cast<float>(out_h) / h);
  int sw = static_cast<int>(w * scale);
  int sh = static_cast<int>(h * scale);
  sw = std::max(sw, 1);
  sh = std::max(sh, 1);
  std::vector<uint8_t> resized(static_cast<size_t>(sw) * sh * 3);
  resize_bilinear(rgb.data(), h, w, resized.data(), sh, sw, 3);
  int top = (out_h - sh) / 2;
  int left = (out_w - sw) / 2;
  std::memset(out_buf, fill, static_cast<size_t>(out_w) * out_h * 3);
  for (int y = 0; y < sh; ++y) {
    for (int x = 0; x < sw; ++x) {
      const uint8_t* src = resized.data() + (y * sw + x) * 3;
      uint8_t* dst = out_buf + ((y + top) * out_w + (x + left)) * 3;
      dst[0] = src[2];  // RGB -> BGR (the framework's canonical input order)
      dst[1] = src[1];
      dst[2] = src[0];
    }
  }
  return 0;
}

// Batch decode with a thread pool. data/lens: n JPEG buffers. out:
// [n, out_h, out_w, 3] u8. status: per-item 0/-1. Returns count of failures.
int fdrt_decode_letterbox_batch(const uint8_t** data, const size_t* lens,
                                int n, int out_w, int out_h, uint8_t fill,
                                uint8_t* out, int* status, int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(out_w) * out_h * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = fdrt_decode_letterbox(data[i], lens[i], out_w, out_h, fill,
                                     out + stride * i);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Report JPEG dimensions without decoding pixel data (header-only pass) so
// callers can size a full-resolution buffer. Returns 0 ok, -1 parse error.
int fdrt_jpeg_dims(const uint8_t* data, size_t len, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  *out_w = cinfo.image_width;
  *out_h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode JPEG bytes at full resolution into caller-allocated BGR u8 HWC
// buffer of exactly w*h*3 bytes (w/h from fdrt_jpeg_dims). The cv2.imread
// replacement for the dataset loaders. Returns 0 ok, -1 error/size mismatch.
int fdrt_decode_bgr(const uint8_t* data, size_t len, uint8_t* out_buf,
                    int w, int h) {
  std::vector<uint8_t> rgb;
  int dh = 0, dw = 0;
  if (decode_jpeg(data, len, &rgb, &dh, &dw, /*target_min_dim=*/0) != 0)
    return -1;
  if (dw != w || dh != h) return -1;
  const size_t n = static_cast<size_t>(w) * h;
  for (size_t i = 0; i < n; ++i) {  // RGB -> BGR
    out_buf[i * 3 + 0] = rgb[i * 3 + 2];
    out_buf[i * 3 + 1] = rgb[i * 3 + 1];
    out_buf[i * 3 + 2] = rgb[i * 3 + 0];
  }
  return 0;
}

int fdrt_version() { return 2; }

}  // extern "C"
