// ttl_decode: threaded JPEG decode + static-canvas packing for the TTL-TPU
// host data path.
//
// The framework ships each test sample to the device as one uint8 canvas
// (ttl_tpu/data/views.py); everything else runs on-device. This library is
// the native equivalent of the reference's DataLoader worker processes
// (reference: ttl.py:275-278 + PIL decode inside data/datautils.py): it
// decodes JPEGs with libjpeg (using DCT scaling to skip work when the image
// must shrink anyway), bilinear-resizes to fit the canvas, and packs RGB
// rows directly into the caller's pinned buffer - no Python or PIL in the
// loop, and a pthread pool so decode overlaps TPU compute even from a
// single Python thread.
//
// C ABI (consumed via ctypes from ttl_tpu/data/native_decode.py):
//   ttl_decode_jpeg(path, canvas, canvas_size, &h, &w)      -> 0 on success
//   ttl_decode_batch(paths, n, canvases, canvas_size, hs, ws, n_threads)
//        -> number of successful decodes; failures leave hs[i] == 0 and the
//           caller falls back to the PIL path for those entries.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* mgr = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

// Bilinear resize (H,W,3 uint8) -> (out_h,out_w,3) written at row stride
// canvas_size*3 into the canvas buffer.
void resize_into(const uint8_t* src, int sh, int sw, uint8_t* canvas,
                 int canvas_size, int oh, int ow) {
  const float ry = static_cast<float>(sh) / oh;
  const float rx = static_cast<float>(sw) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * ry - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > sh - 2) y0 = sh - 2;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    uint8_t* out_row = canvas + static_cast<size_t>(y) * canvas_size * 3;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(sw) * 3;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * rx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > sw - 2) x0 = sw - 2;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0 * 3 + c] * (1 - wx) + r0[(x0 + 1) * 3 + c] * wx;
        float bot = r1[x0 * 3 + c] * (1 - wx) + r1[(x0 + 1) * 3 + c] * wx;
        out_row[x * 3 + c] =
            static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

int ttl_decode_jpeg(const char* path, uint8_t* canvas, int canvas_size,
                    int* out_h, int* out_w) {
  *out_h = 0;
  *out_w = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  std::vector<uint8_t> pixels;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // DCT scaling: pick the largest 1/2^k that keeps the long side >= canvas
  // (decode cost drops ~4x per step; final fit is the bilinear pass below)
  int long_side = cinfo.image_width > cinfo.image_height
                      ? cinfo.image_width
                      : cinfo.image_height;
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  while (cinfo.scale_denom < 8 &&
         long_side / (cinfo.scale_denom * 2) >= canvas_size) {
    cinfo.scale_denom *= 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  pixels.resize(static_cast<size_t>(sw) * sh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() +
                   static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);

  int oh = sh, ow = sw;
  if (sh > canvas_size || sw > canvas_size) {
    const float s = static_cast<float>(canvas_size) / (sh > sw ? sh : sw);
    oh = static_cast<int>(sh * s + 0.5f);
    ow = static_cast<int>(sw * s + 0.5f);
    if (oh < 1) oh = 1;
    if (ow < 1) ow = 1;
    if (oh > canvas_size) oh = canvas_size;
    if (ow > canvas_size) ow = canvas_size;
    resize_into(pixels.data(), sh, sw, canvas, canvas_size, oh, ow);
  } else {
    for (int y = 0; y < sh; ++y) {
      std::memcpy(canvas + static_cast<size_t>(y) * canvas_size * 3,
                  pixels.data() + static_cast<size_t>(y) * sw * 3,
                  static_cast<size_t>(sw) * 3);
    }
  }
  *out_h = oh;
  *out_w = ow;
  return 0;
}

int ttl_decode_batch(const char** paths, int n, uint8_t* canvases,
                     int canvas_size, int* hs, int* ws, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t canvas_bytes =
      static_cast<size_t>(canvas_size) * canvas_size * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      std::memset(canvases + i * canvas_bytes, 0, canvas_bytes);
      if (ttl_decode_jpeg(paths[i], canvases + i * canvas_bytes, canvas_size,
                          &hs[i], &ws[i]) == 0) {
        ok.fetch_add(1);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
